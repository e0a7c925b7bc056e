// gfvgn_host — native host-runtime kernels for the gen-fvgn-tpu framework.
//
// The TPU-side compute path is JAX/XLA; this library covers the host-side
// graph-builder hot loops that feed it (the role torch_scatter/pyg's C++
// extensions play in the reference, SURVEY.md §2.4): k-hop stencil
// construction, CSR segment-plan building for padded gather tables, and
// ragged CCW cell sorting. Exposed as a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libgfvgn_host.so gfvgn_host.cc

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Free a buffer previously returned by this library.
void gfvgn_free(void* ptr) { std::free(ptr); }

// K-hop neighbour pairs: all unordered node pairs (i < j) connected by a
// walk of length 1..k over the undirected edge list. Equivalent to the
// union of boolean adjacency powers A^1..A^k (parse_to_h5.py:228-254)
// minus self-loops, computed by per-node BFS to depth k.
//
// edges: [2 * n_edges] int64 (pairs, any orientation)
// Returns the pair count; *out_pairs is malloc'd [2 * count] int64
// (row0 = i, row1 = j, i < j, sorted lexicographically).
int64_t gfvgn_khop_pairs(const int64_t* edges, int64_t n_edges,
                         int64_t n_nodes, int32_t k,
                         int64_t** out_pairs) {
  // build CSR adjacency
  std::vector<int64_t> deg(n_nodes, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    ++deg[edges[e]];
    ++deg[edges[n_edges + e]];
  }
  std::vector<int64_t> offs(n_nodes + 1, 0);
  for (int64_t i = 0; i < n_nodes; ++i) offs[i + 1] = offs[i] + deg[i];
  std::vector<int64_t> adj(offs[n_nodes]);
  std::vector<int64_t> fill(n_nodes, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t a = edges[e], b = edges[n_edges + e];
    adj[offs[a] + fill[a]++] = b;
    adj[offs[b] + fill[b]++] = a;
  }

  std::vector<int64_t> pairs;  // flattened (i, j) with i < j
  std::vector<int32_t> dist(n_nodes, -1);
  std::vector<int64_t> frontier, next, visited;

  for (int64_t src = 0; src < n_nodes; ++src) {
    frontier.clear();
    visited.clear();
    frontier.push_back(src);
    dist[src] = 0;
    visited.push_back(src);
    for (int32_t depth = 1; depth <= k; ++depth) {
      next.clear();
      for (int64_t u : frontier) {
        for (int64_t t = offs[u]; t < offs[u + 1]; ++t) {
          int64_t v = adj[t];
          if (dist[v] < 0) {
            dist[v] = depth;
            next.push_back(v);
            visited.push_back(v);
            if (v > src) {
              pairs.push_back(src);
              pairs.push_back(v);
            }
          }
        }
      }
      frontier.swap(next);
    }
    for (int64_t v : visited) dist[v] = -1;
  }

  int64_t count = static_cast<int64_t>(pairs.size() / 2);
  int64_t* out = static_cast<int64_t*>(
      std::malloc(sizeof(int64_t) * 2 * std::max<int64_t>(count, 1)));
  // transpose to [2, count] layout (row-major rows)
  for (int64_t p = 0; p < count; ++p) {
    out[p] = pairs[2 * p];
    out[count + p] = pairs[2 * p + 1];
  }
  *out_pairs = out;
  return count;
}

// CSR segment plan: for segment ids in [0, n_segments), produce the stable
// permutation that groups entries by segment plus segment offsets. This is
// the host-side prep for sorted-segment device reductions / padded gather
// tables.
//
// seg_ids: [n] int32; out_perm: [n] int32 (caller-allocated);
// out_offsets: [n_segments + 1] int64 (caller-allocated).
void gfvgn_segment_plan(const int32_t* seg_ids, int64_t n,
                        int64_t n_segments, int32_t* out_perm,
                        int64_t* out_offsets) {
  std::vector<int64_t> count(n_segments + 1, 0);
  for (int64_t i = 0; i < n; ++i) ++count[seg_ids[i] + 1];
  for (int64_t s = 0; s < n_segments; ++s) count[s + 1] += count[s];
  std::memcpy(out_offsets, count.data(),
              sizeof(int64_t) * (n_segments + 1));
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    out_perm[cursor[seg_ids[i]]++] = static_cast<int32_t>(i);
  }
}

// Padded gather table: [n_segments, max_degree] source indices + mask from
// a segment-id array. Returns max_degree; out buffers are malloc'd.
int64_t gfvgn_gather_table(const int32_t* seg_ids, int64_t n,
                           int64_t n_segments, int32_t** out_table,
                           uint8_t** out_mask) {
  std::vector<int64_t> count(n_segments, 0);
  for (int64_t i = 0; i < n; ++i) ++count[seg_ids[i]];
  int64_t max_deg = 0;
  for (int64_t s = 0; s < n_segments; ++s)
    max_deg = std::max(max_deg, count[s]);
  max_deg = std::max<int64_t>(max_deg, 1);

  int32_t* table = static_cast<int32_t*>(
      std::calloc(n_segments * max_deg, sizeof(int32_t)));
  uint8_t* mask = static_cast<uint8_t*>(
      std::calloc(n_segments * max_deg, sizeof(uint8_t)));
  std::vector<int64_t> cursor(n_segments, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t s = seg_ids[i];
    table[s * max_deg + cursor[s]] = static_cast<int32_t>(i);
    mask[s * max_deg + cursor[s]] = 1;
    ++cursor[s];
  }
  *out_table = table;
  *out_mask = mask;
  return max_deg;
}

// Ragged CCW sort: reorder each cell's slots counter-clockwise around its
// centroid (vectorized equivalent lives in geometry.py; this is the
// native fast path for large meshes). In-place on cells_node.
// points: [n_points, 2]; cells_node/cells_index: [n_slots] with contiguous
// slots per cell; centroid: [n_cells, 2].
void gfvgn_ccw_sort(const double* points, int64_t* cells_node,
                    const int64_t* cells_index, int64_t n_slots,
                    const double* centroid) {
  int64_t start = 0;
  while (start < n_slots) {
    int64_t cell = cells_index[start];
    int64_t end = start;
    while (end < n_slots && cells_index[end] == cell) ++end;
    std::sort(cells_node + start, cells_node + end,
              [&](int64_t a, int64_t b) {
                double ax = points[2 * a] - centroid[2 * cell];
                double ay = points[2 * a + 1] - centroid[2 * cell + 1];
                double bx = points[2 * b] - centroid[2 * cell];
                double by = points[2 * b + 1] - centroid[2 * cell + 1];
                return std::atan2(ay, ax) < std::atan2(by, bx);
              });
    start = end;
  }
}

}  // extern "C"
