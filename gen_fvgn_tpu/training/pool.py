"""Environment pool: the streaming (mesh × boundary-condition) curriculum.

Behavior parity with the reference `Data_Pool` (Graph_loader.py:28-396):
environments hold an autoregressive uvp state that the model writes back each
outer step (`payback`), and the oldest environment is periodically re-rolled
to a freshly sampled boundary condition (`reset_env`) — an experience-replay
buffer over PDE instances.

TPU redesign: every environment is a padded `MeshSample` in a single bucket,
so a batch is a NumPy stack and BC re-rolls change only VALUES (θ, targets,
initial uvp), never shapes — zero recompiles across resets (SURVEY.md §7).
Stencils and WLSQ moments are computed once per mesh at load, exactly like
the reference's `construct_stencil`/`calc_WLSQ_A_B_normal_matrix` guards
(Load_mesh.py:427, :249).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.physics import init_environment, theta_vector
from gen_fvgn_tpu.graph.sample import (MeshSample, PadSizes,
                                       pad_mesh_to_sample, stack_samples)
from gen_fvgn_tpu.meshes.bc import ThetaSample, generate_theta_combinations, load_bc
from gen_fvgn_tpu.meshes.comsol import comsol_to_mesh
from gen_fvgn_tpu.meshes.geometry import build_stencil, compile_mesh
from gen_fvgn_tpu.meshes.hdf5 import read_mesh_h5


def _jitted_moments(order: str):
    import jax
    from gen_fvgn_tpu.ops.wlsq import wlsq_moments
    return jax.jit(lambda pos, stencil: wlsq_moments(pos, stencil, order))


_MOMENTS_CACHE: Dict[str, object] = {}


def prepare_mesh_statics(mesh: Dict[str, np.ndarray], order: str,
                         k_hop: int = 2) -> Dict[str, np.ndarray]:
    """Attach the WLSQ stencil and precomputed moments (once per mesh)."""
    if "stencil" in mesh:
        return mesh
    n_nodes = mesh["node|pos"].shape[0]
    stencil = build_stencil(mesh["face|face_node"].astype(np.int64),
                            mesh["face_node_x"].astype(np.int64),
                            n_nodes, k_hop=k_hop)
    mesh["stencil"] = stencil

    # moments via the same device kernel used at runtime (jitted, once/mesh)
    if order not in _MOMENTS_CACHE:
        _MOMENTS_CACHE[order] = _jitted_moments(order)
    A, wB, colscale = _MOMENTS_CACHE[order](
        mesh["node|pos"].astype(np.float32), stencil.astype(np.int32))
    from gen_fvgn_tpu.ops.wlsq import wlsq_solve_matrix
    mesh["wlsq_S"] = wlsq_solve_matrix(np.asarray(A), np.asarray(colscale),
                                       order=order)
    mesh["wlsq_B"] = np.asarray(wB, dtype=np.float32)
    mesh["wlsq_scale"] = np.asarray(colscale, dtype=np.float32)
    return mesh


def ensure_rcm(mesh: Dict[str, np.ndarray],
               method: str = "rcm") -> Dict[str, np.ndarray]:
    """Re-derive a compiled mesh with RCM node ordering (block engine
    requirement: banded operators). Idempotent-ish: re-running RCM on an
    already-banded mesh is harmless. method="hilbert" selects the
    space-filling-curve ordering instead (perf A/B, scripts/ordering_ab.py);
    overridable globally via GFVGN_ORDERING for step-level experiments."""
    from gen_fvgn_tpu.graph.operators import rcm_reorder
    method = os.environ.get("GFVGN_ORDERING", method)
    raw = {
        "node|pos": mesh["node|pos"],
        "node|node_type": np.asarray(mesh["node|node_type"]).reshape(-1),
        "node|surf_mask": np.asarray(
            mesh.get("node|surf_mask",
                     np.zeros(mesh["node|pos"].shape[0], bool))).reshape(-1),
        "cells_node": mesh["cells_node"],
        "cells_index": mesh["cells_index"],
    }
    return compile_mesh(rcm_reorder(raw, method=method))


def load_case(case_dir: str, order: str = "2nd") -> Dict:
    """Load one case directory: .h5 if present, else parse + compile the
    COMSOL mesh in place. Returns {"mesh", "bc", "combos", "case_name"}."""
    bc = load_bc(os.path.join(case_dir, "BC.json"))
    h5s = [f for f in os.listdir(case_dir) if f.endswith(".h5")]
    if h5s:
        mesh = read_mesh_h5(os.path.join(case_dir, h5s[0]))
    else:
        mphtxt = [f for f in os.listdir(case_dir) if f.endswith(".mphtxt")]
        dats = [f for f in os.listdir(case_dir) if f.endswith(".dat")]
        if mphtxt:
            mesh = compile_mesh(
                comsol_to_mesh(os.path.join(case_dir, mphtxt[0]), bc))
        elif dats:
            # Tecplot FE-polygon case (e.g. cylinder_flow_poly): convert in
            # place (parity: the reference feeds these straight through
            # parse_tecplot.py:639-652)
            from gen_fvgn_tpu.meshes.tecplot import tecplot_to_mesh
            case_name = os.path.basename(os.path.abspath(case_dir))
            mesh = compile_mesh(
                tecplot_to_mesh(os.path.join(case_dir, dats[0]), case_name))
        else:
            raise FileNotFoundError(
                f"{case_dir}: no .h5, .mphtxt, or .dat mesh")
    mesh = prepare_mesh_statics(mesh, order, k_hop=int(bc.get("stencil|khops", 2)))
    return {
        "mesh": mesh,
        "bc": bc,
        "combos": generate_theta_combinations(bc["theta_PDE"]),
        "case_name": os.path.basename(os.path.abspath(case_dir)),
    }


@dataclass
class Environment:
    case: Dict                       # shared per-case statics
    sample: MeshSample               # padded arrays (NumPy), mutable uvp
    theta_sample: ThetaSample
    case_idx: int = 0
    age: int = 0


class EnvPool:
    """Pool of padded environments with payback / reset-BC streaming.

    With device_resident=True (the default) the WHOLE pool lives in HBM as
    one stacked [M, ...] MeshSample; batch gather and payback are jitted
    device ops and the training loop never ships mesh arrays over the host
    link except on a BC re-roll (and then only the few value arrays the
    re-roll changes). This is the single biggest performance lever vs the
    naive port: feeding numpy batches re-uploads O(50 MB) per step.
    """

    def __init__(self, case_dirs: Sequence[str], cfg: Config,
                 seed: int = 0, pad_multiple: int = 128,
                 dataset_size: Optional[int] = None,
                 cases: Optional[List[Dict]] = None,
                 device_resident: bool = False,
                 engine: str = "segment",
                 tile: int = 256,
                 bucket_tiers: bool = False):
        self.cfg = cfg
        self.engine = engine
        self.tile = tile
        self.bucket_tiers = bucket_tiers
        self.rng = np.random.default_rng(seed)
        if engine == "block":
            pad_multiple = max(pad_multiple, tile)
        if cases is not None:
            self.cases = [dict(c) for c in cases]
            for c in self.cases:
                mesh = dict(c["mesh"])
                if engine == "block":
                    mesh = ensure_rcm(mesh)
                c["mesh"] = prepare_mesh_statics(
                    mesh, cfg.order,
                    k_hop=int(c["bc"].get("stencil|khops", 2)))
        else:
            self.cases = [load_case(d, cfg.order) for d in case_dirs]
            if engine == "block":
                for c in self.cases:
                    mesh = ensure_rcm(c["mesh"])
                    c["mesh"] = prepare_mesh_statics(
                        mesh, cfg.order,
                        k_hop=int(c["bc"].get("stencil|khops", 2)))

        size = dataset_size if dataset_size is not None else cfg.dataset_size
        size = max(size, cfg.batch_size)

        self.sizes = PadSizes.for_meshes([c["mesh"] for c in self.cases],
                                         multiple=pad_multiple)
        # block engine: per-case buckets (batches are single-case, so every
        # case can use its own minimal padded shape; jit retraces per shape,
        # amortized by the persistent compilation cache).
        # segment engine with bucket_tiers: per-case buckets too — cases with
        # EQUAL padded sizes share a tier, batches stay within a tier (one
        # compiled step per tier instead of padding everything to the largest
        # case; the committed mixed-vs-stratified study shows the stratified
        # curriculum converges equivalently).
        if engine == "block" or bucket_tiers:
            self.case_sizes = [
                PadSizes.for_meshes([c["mesh"]], multiple=pad_multiple)
                for c in self.cases]
        else:
            self.case_sizes = [self.sizes] * len(self.cases)
        # tier = distinct padded-size signature; env → tier via its case
        tier_keys: Dict[tuple, int] = {}
        self._case_tier: List[int] = []
        for cs in self.case_sizes:
            key = (cs.n_nodes, cs.n_faces, cs.n_cells, cs.n_slots,
                   cs.n_stencil)
            self._case_tier.append(tier_keys.setdefault(key, len(tier_keys)))
        self.n_tiers = len(tier_keys)
        self.envs: List[Environment] = []
        i = 0
        while len(self.envs) < size:
            ci = i % len(self.cases)
            self.envs.append(self._make_env(self.cases[ci], ci))
            i += 1

        self.device_resident = device_resident
        self._device_data = None
        if device_resident:
            self._init_device_pool()

        self.statics = None
        self._dyn_pool = None
        if engine == "block":
            self._init_block_pool()

    # ---- block engine: per-case StaticPacks + device dynamic pool ----

    def _init_block_pool(self) -> None:
        import jax
        import jax.numpy as jnp
        from gen_fvgn_tpu.graph.packs import (build_static_pack,
                                              dynamic_from_sample)
        self.statics = [
            jax.device_put(build_static_pack(
                c["mesh"], self.cfg.order, self.case_sizes[ci], self.tile,
                wlsq_rows=getattr(self.cfg, "wlsq_block_rows", "grad"),
                node_agg=getattr(self.cfg, "node_agg", "split"),
                edge_gather=getattr(self.cfg, "edge_gather", "take")))
            for ci, c in enumerate(self.cases)]

        # one device dynamic pool per case (shapes differ across cases)
        self._env_local: List[int] = [0] * len(self.envs)
        per_case: Dict[int, list] = {}
        for i, env in enumerate(self.envs):
            self._env_local[i] = len(per_case.setdefault(env.case_idx, []))
            per_case[env.case_idx].append(i)
        self._dyn_pools = {}
        for ci, env_ids in per_case.items():
            dyns = [dynamic_from_sample(self.envs[i].sample) for i in env_ids]
            self._dyn_pools[ci] = jax.device_put(jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *dyns))

        self._jit_dyn_gather = jax.jit(
            lambda data, idxs: jax.tree_util.tree_map(
                lambda x: jnp.take(x, idxs, axis=0), data))

        def _payback(data, idxs, uvp_new):
            return data.replace(uvp=data.uvp.at[idxs].set(uvp_new))
        self._jit_dyn_payback = jax.jit(_payback, donate_argnums=(0,))

        def _reroll(data, idx, new_vals):
            updates = {f: getattr(data, f).at[idx].set(new_vals[f])
                       for f in new_vals}
            return data.replace(**updates)
        self._jit_dyn_reroll = jax.jit(_reroll, donate_argnums=(0,))

    def block_batches(self, step_seed: int):
        """Per-case batches: list of (case_idx, env_index_array). Batches are
        single-case so the shared StaticPack applies to the whole batch
        (TPU adaptation — the reference mixes cases freely in a batch)."""
        rng = np.random.default_rng(step_seed)
        bs = self.cfg.batch_size
        out = []
        by_case: Dict[int, list] = {}
        for i, env in enumerate(self.envs):
            by_case.setdefault(env.case_idx, []).append(i)
        for ci, idxs in by_case.items():
            perm = rng.permutation(idxs)
            for j in range(len(perm) // bs):
                out.append((ci, perm[j * bs:(j + 1) * bs].astype(np.int32)))
        rng.shuffle(out)
        return out

    def mixed_block_batches(self, step_seed: int, n_dev: int = 1):
        """Reference-parity mixed sampler (SharedSampler,
        Graph_loader.py:786-828): ONE global permutation over all envs cut
        into batch_size chunks, each chunk split into per-case groups so
        the shared StaticPack still serves each group. Returns a list of
        batches; a batch is a list of (case_idx, idxs, weights, n_real).
        Groups are padded to the next power of two with repeated rows at
        weight 0 (few compiled shapes); real rows carry weight
        1/batch_size, so the sum of weighted group gradients is EXACTLY
        the batch-mean gradient of the reference's mixed batch.

        n_dev > 1 (mixed batches under dp): every group additionally pads
        to a multiple of n_dev so its rows shard evenly over the dp mesh —
        fixed-shape group packing; the weighted-sum gradient is unchanged
        because pad rows carry weight 0."""
        rng = np.random.default_rng(step_seed)
        bs = self.cfg.batch_size
        perm = rng.permutation(len(self.envs))
        out = []
        for j in range(len(perm) // bs):
            chunk = perm[j * bs:(j + 1) * bs]
            groups: Dict[int, list] = {}
            for i in chunk:
                groups.setdefault(self.envs[int(i)].case_idx,
                                  []).append(int(i))
            batch = []
            for ci in sorted(groups):
                ix = groups[ci]
                g = len(ix)
                gp = 1 << (g - 1).bit_length()
                if n_dev > 1:
                    gp = max(gp, n_dev)
                    if gp % n_dev:              # n_dev not a power of two
                        gp = -(-gp // n_dev) * n_dev
                idxs = np.asarray(ix + [ix[k % g] for k in range(gp - g)],
                                  np.int32)
                w = np.zeros(gp, np.float32)
                w[:g] = 1.0 / bs
                batch.append((ci, idxs, w, g))
            out.append(batch)
        return out

    def gather_block(self, idxs: np.ndarray):
        import jax.numpy as jnp
        ci = self.envs[int(idxs[0])].case_idx
        local = np.asarray([self._env_local[int(i)] for i in idxs], np.int32)
        return self._jit_dyn_gather(self._dyn_pools[ci],
                                    jnp.asarray(local, jnp.int32))

    def payback_block(self, idxs: np.ndarray, uvp_new) -> None:
        import jax.numpy as jnp
        ci = self.envs[int(idxs[0])].case_idx
        local = np.asarray([self._env_local[int(i)] for i in idxs], np.int32)
        if (hasattr(uvp_new, "sharding")
                and len(uvp_new.sharding.device_set) > 1):
            # dp-sharded payback: gather once per inner-loop tail (matches
            # the reference's one-transfer-per-sequence pattern)
            uvp_new = np.asarray(uvp_new)
        self._dyn_pools[ci] = self._jit_dyn_payback(
            self._dyn_pools[ci], jnp.asarray(local, jnp.int32), uvp_new)
        for i in idxs:
            self.envs[int(i)].age += 1

    def reset_env_block(self, export_dir: Optional[str] = None) -> None:
        """Oldest-env BC re-roll for the block pool (values only). With
        export_dir set, the retiring solution is exported first (parity with
        the reference's plot-on-reset, Graph_loader.py:231-321)."""
        if not hasattr(self, "_age_order") or len(self._age_order) != len(self.envs):
            self._age_order = list(range(len(self.envs)))
        if export_dir is not None:
            self._try_export(self._age_order[0], export_dir)
        pos = self._age_order.pop(0)
        new_env = self._make_env(self.envs[pos].case, self.envs[pos].case_idx)
        self.envs[pos] = new_env
        self._age_order.append(pos)
        from gen_fvgn_tpu.graph.packs import dynamic_from_sample
        dyn = dynamic_from_sample(new_env.sample)
        new_vals = {f: np.asarray(getattr(dyn, f))
                    for f in ("uvp", "target_uv", "theta", "sigma",
                              "uvp_dim", "dt")}
        ci = new_env.case_idx
        self._dyn_pools[ci] = self._jit_dyn_reroll(
            self._dyn_pools[ci], np.int32(self._env_local[pos]), new_vals)

    # ---- device-resident pool ----

    def _init_device_pool(self) -> None:
        import jax
        import jax.numpy as jnp
        # one stacked device tree per tier (single tier = one [M, ...] tree)
        self._env_tier = [self._case_tier[e.case_idx] for e in self.envs]
        self._env_tlocal = [0] * len(self.envs)
        per_tier: Dict[int, list] = {}
        for i, t in enumerate(self._env_tier):
            self._env_tlocal[i] = len(per_tier.setdefault(t, []))
            per_tier[t].append(i)
        self._device_data = {
            t: jax.device_put(stack_samples(
                [self.envs[i].sample for i in ids]))
            for t, ids in per_tier.items()}

        self._jit_gather = jax.jit(
            lambda data, idxs: jax.tree_util.tree_map(
                lambda x: jnp.take(x, idxs, axis=0), data))

        def _payback(data, idxs, uvp_new):
            return data.replace(uvp=data.uvp.at[idxs].set(uvp_new))
        self._jit_payback = jax.jit(_payback, donate_argnums=(0,))

        # BC re-roll updates only the value arrays (geometry is static)
        reroll_fields = ("uvp", "target_uv", "theta", "sigma", "uvp_dim", "dt")

        def _reroll(data, idx, new_vals):
            updates = {f: getattr(data, f).at[idx].set(new_vals[f])
                       for f in reroll_fields}
            return data.replace(**updates)
        self._jit_reroll = jax.jit(_reroll, donate_argnums=(0,))
        self._reroll_fields = reroll_fields

    # ---- environment construction / BC re-roll ----

    def _make_env(self, case: Dict, case_idx: int = 0) -> Environment:
        ts = case["combos"][self.rng.integers(len(case["combos"]))]
        mesh = case["mesh"]
        vals = theta_vector(case["bc"]["theta_PDE"], ts)
        uvp, target = init_environment(
            mesh["node|pos"].astype(np.float32),
            mesh["node|node_type"].reshape(-1), ts,
            inlet_type=case["bc"].get("inlet_type", "uniform"),
            init_field_type=case["bc"].get("init_field_type", "uniform"))
        prepared = dict(mesh)
        prepared.update(vals)
        prepared["uvp"] = uvp
        prepared["target|uvp"] = target
        prepared["sigma"] = np.asarray(case["bc"]["sigma"], dtype=np.float32)
        sizes = (self.case_sizes[case_idx] if hasattr(self, "case_sizes")
                 else self.sizes)
        sample = pad_mesh_to_sample(prepared, sizes, self.cfg.order)
        return Environment(case=case, sample=sample, theta_sample=ts,
                           case_idx=case_idx)

    def _try_export(self, pos: int, export_dir: str) -> None:
        """Export-on-reset wrapper: a failing exporter (full disk, bad mesh)
        must not kill training, but it must leave a trace — the retiring
        solution is otherwise silently lost."""
        try:
            self.export_env(pos, export_dir, tag="_reset")
        except Exception as exc:                      # noqa: BLE001
            import warnings
            env = self.envs[pos]
            warnings.warn(
                f"export-on-reset failed for case "
                f"{env.case.get('case_name', '?')} (env {pos}, "
                f"dir {export_dir!r}): {type(exc).__name__}: {exc}")

    def export_env(self, pos: int, out_dir: str, tag: str = "") -> str:
        """Export an environment's current solution to Tecplot (parity with
        the reference's export-on-reset, Graph_loader.py:231-321)."""
        from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
        env = self.envs[pos]
        mesh = env.case["mesh"]
        n = mesh["node|pos"].shape[0]
        uvp = self.host_uvp(pos)[:n]
        path = os.path.join(
            out_dir, f"{env.case['case_name']}{tag}_age{env.age}.dat")
        write_tecplot_zone(
            path, mesh["node|pos"], mesh["cells_node"], mesh["cells_index"],
            {"U": uvp[:, 0], "V": uvp[:, 1], "P": uvp[:, 2]},
            zone_title=env.case["case_name"], solution_time=float(env.age))
        return path

    def reset_env(self, export_dir: Optional[str] = None) -> None:
        """Re-roll the OLDEST environment's boundary condition in place
        (parity: Data_Pool.reset_env pops index 0 and appends the re-rolled
        mesh, Graph_loader.py:154-229; here slots are stable and age is
        tracked separately so the device pool never reshapes). With
        export_dir set, the outgoing solution is exported first (parity with
        the reference's plot-on-reset)."""
        if not hasattr(self, "_age_order") or len(self._age_order) != len(self.envs):
            self._age_order = list(range(len(self.envs)))
        if export_dir is not None:
            self._try_export(self._age_order[0], export_dir)
        pos = self._age_order.pop(0)
        new_env = self._make_env(self.envs[pos].case,
                                 self.envs[pos].case_idx)
        self.envs[pos] = new_env
        self._age_order.append(pos)
        if self._device_data is not None:
            new_vals = {f: np.asarray(getattr(new_env.sample, f))
                        for f in self._reroll_fields}
            t = self._env_tier[pos]
            self._device_data[t] = self._jit_reroll(
                self._device_data[t], np.int32(self._env_tlocal[pos]),
                new_vals)

    # ---- batching ----

    def __len__(self) -> int:
        return len(self.envs)

    def batch_indices(self, step_seed: int) -> List[np.ndarray]:
        """Epoch-seeded permutation split into batches of batch_size (parity:
        SharedSampler, Graph_loader.py:786-828). Drops the ragged tail.
        With multiple bucket tiers, batches are formed within a tier (the
        committed mixed-vs-stratified study shows equivalent convergence)."""
        rng = np.random.default_rng(step_seed)
        bs = self.cfg.batch_size
        if self.n_tiers == 1:
            perm = rng.permutation(len(self.envs))
            return [perm[i * bs:(i + 1) * bs]
                    for i in range(len(self.envs) // bs)]
        by_tier: Dict[int, list] = {}
        for i, env in enumerate(self.envs):
            by_tier.setdefault(self._case_tier[env.case_idx], []).append(i)
        out = []
        for ids in by_tier.values():
            perm = rng.permutation(ids)
            out += [perm[i * bs:(i + 1) * bs].astype(np.int64)
                    for i in range(len(ids) // bs)]
        rng.shuffle(out)
        return out

    def gather_batch(self, idxs: np.ndarray) -> MeshSample:
        if self._device_data is not None:
            import jax.numpy as jnp
            t = self._env_tier[int(idxs[0])]
            if self.n_tiers > 1 and any(
                    self._env_tier[int(i)] != t for i in idxs):
                raise ValueError("batch mixes bucket tiers; use "
                                 "batch_indices() to form batches")
            local = np.asarray([self._env_tlocal[int(i)] for i in idxs],
                               np.int32)
            return self._jit_gather(self._device_data[t],
                                    jnp.asarray(local, jnp.int32))
        return stack_samples([self.envs[int(i)].sample for i in idxs])

    def payback(self, idxs: np.ndarray, uvp_new) -> None:
        """Write the detached new state back into the pooled environments
        (parity: Data_Pool.payback, Graph_loader.py:370-383). With a
        device-resident pool, `uvp_new` stays a device array — no host copy."""
        if self._device_data is not None:
            import jax.numpy as jnp
            if (hasattr(uvp_new, "sharding")
                    and len(uvp_new.sharding.device_set) > 1):
                uvp_new = np.asarray(uvp_new)   # dp-sharded payback
            t = self._env_tier[int(idxs[0])]
            local = np.asarray([self._env_tlocal[int(i)] for i in idxs],
                               np.int32)
            self._device_data[t] = self._jit_payback(
                self._device_data[t], jnp.asarray(local, jnp.int32), uvp_new)
            for i in idxs:
                self.envs[int(i)].age += 1
            return
        for row, i in enumerate(idxs):
            env = self.envs[int(i)]
            env.sample = env.sample.replace(
                uvp=np.asarray(uvp_new[row], dtype=np.float32))
            env.age += 1

    def has_wave_envs(self) -> bool:
        return any(e.theta_sample.source_frequency != 0 for e in self.envs)

    def inject_wave_sources(self) -> None:
        """Add each wave environment's Gaussian point pressure source signal
        to its pooled p channel for the CURRENT time step (parity:
        Graph_loader.py:323-363 `update_env` — `wave_uvp_on_node[:, 2:3] +=
        source_pressure_node` every outer step). Called once per epoch by
        the train loops; no-op for NS/Poisson environments.

        Signals are BATCHED per device pool (one jitted `.at[idxs].add`
        per block-engine case / device tier), so the dispatch count is
        independent of pool size — one injection per env was O(pool)
        round-trips through the ~1 ms-floor remote-dispatch relay
        (round-2 verdict #7)."""
        import jax.numpy as jnp
        from gen_fvgn_tpu.graph.physics import pressure_point_source

        if not hasattr(self, "_jit_wave_add"):
            def _add(data, idxs, signals):
                return data.replace(
                    uvp=data.uvp.at[idxs, :, 2].add(signals))
            import jax
            self._jit_wave_add = jax.jit(_add, donate_argnums=(0,))

        # group (pool key, local slot, host-computed signal) per wave env
        groups: Dict[tuple, list] = {}
        for i, env in enumerate(self.envs):
            ts = env.theta_sample
            if ts.source_frequency == 0:
                continue
            pos = env.case["mesh"]["node|pos"].astype(np.float32)
            center = pos.mean(axis=0)
            time_index = env.age + 1                      # must be >= 1
            signal = pressure_point_source(
                pos, center, ts.source_frequency, ts.source_strength,
                ts.dt, time_index).reshape(-1).astype(np.float32)
            if self.engine == "block":
                key = ("case", env.case_idx)
                local = self._env_local[i]
            elif self._device_data is not None:
                key = ("tier", self._env_tier[i])
                local = self._env_tlocal[i]
            else:
                uvp = np.asarray(env.sample.uvp).copy()
                uvp[: signal.shape[0], 2] += signal
                env.sample = env.sample.replace(uvp=uvp)
                continue
            groups.setdefault(key, []).append((local, signal))

        for (kind, kid), items in groups.items():
            pool = (self._dyn_pools[kid] if kind == "case"
                    else self._device_data[kid])
            n_pad = pool.uvp.shape[1]
            idxs = np.asarray([loc for loc, _ in items], np.int32)
            sigs = np.zeros((len(items), n_pad), np.float32)
            for row, (_, signal) in enumerate(items):
                sigs[row, : signal.shape[0]] = signal
            updated = self._jit_wave_add(pool, jnp.asarray(idxs),
                                         jnp.asarray(sigs))
            if kind == "case":
                self._dyn_pools[kid] = updated
            else:
                self._device_data[kid] = updated

    def host_uvp(self, idx: int) -> np.ndarray:
        """Fetch one environment's current state back to host (for export)."""
        if self.engine == "block":
            ci = self.envs[idx].case_idx
            return np.asarray(self._dyn_pools[ci].uvp[self._env_local[idx]])
        if self._device_data is not None:
            t = self._env_tier[idx]
            return np.asarray(
                self._device_data[t].uvp[self._env_tlocal[idx]])
        return np.asarray(self.envs[idx].sample.uvp)
