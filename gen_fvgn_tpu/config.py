"""Training / solver configuration.

Replaces the reference's argparse namespace (`src/utils/get_param.py:19-82`) with
a frozen dataclass that can be serialized to JSON for checkpoint restore
(parity with `commandline_args.json`, Logger.py:208-209).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class Config:
    # network
    net: str = "TransFVGN_v2"          # {"FVGN", "TransFVGN_v1", "TransFVGN_v2"}
    hidden_size: int = 128
    message_passing_num: int = 3
    node_phi_size: int = 3             # uvp channels at the front of x
    node_input_size: int = 12          # uvp(3) + theta_PDE(9)
    node_output_size: int = 3
    attn_heads: int = 8
    slice_num: int = 32

    # training
    n_epochs: int = 210_000
    batch_size: int = 8
    average_sequence_length: int = 500
    dataset_size: int = 100
    lr: float = 5e-5
    min_lr: float = 1e-6
    max_inner_steps: int = 20
    residual_tolerance: float = 1e-7

    # train strategy (parity: get_param.py:47-56)
    integrator: str = "imex"           # {"explicit", "implicit", "imex"}
    norm_uvp: bool = True
    norm_global: bool = True
    ncn_smooth: bool = True
    conserved_form: bool = True
    order: str = "2nd"                 # WLSQ order {"1st","2nd","3rd","4th"}

    # loss weights (parity: get_param.py:59-61)
    loss_cont: float = 6e4
    loss_mom: float = 5e4
    loss_press: float = 1.0
    # per-sample floor inside the log loss (0 = off, reference parity).
    # mean(log L_b) weights each sample's gradient by 1/L_b, so one
    # fast-converging family (wave: weighted loss ~0.5 vs NS ~1e4)
    # captures the shared weights by a ~1e4x relative factor and the
    # other families freeze (measured: docs_assets_joint_family.json
    # round-4/5 runs). log(max(L_b, floor)) zeroes the gradient of
    # samples already below the floor, releasing the capture.
    loss_log_floor: float = 0.0

    # dataset
    dataset_dir: str = "datasets/balanced_datasets"
    export_on_reset: bool = False      # export retiring env solutions on BC re-roll
                                       # (parity: Graph_loader.py:231-321)

    # TPU-specific
    dtype: str = "float32"             # compute dtype for the network
    mxu_dtype: str = "bfloat16"        # matmul input dtype ("float32" to disable)
    dp_devices: int = 1                # data-parallel shard count of the batch axis
    sp_devices: int = 1                # spatial (domain-decomposition) shard
                                       # count: block-engine operators shard
                                       # on out-tiles over a (dp, sp) mesh
                                       # (parallel/sp.py); 1 = off
    engine: str = "segment"            # {"segment", "block"} sparse-op engine
    tile: int = 256                    # block-engine dense tile size
    fv_packed: bool = True             # block engine: run the FV residual
                                       # section ONCE for the whole batch
                                       # in channel-major packed lanes
                                       # [rows, C·B] instead of per vmap
                                       # lane — removes the (8,128)-tile
                                       # lane padding of the narrow f32 FV
                                       # streams (bytes-budget lever).
                                       # Measured on the bench chip:
                                       # −2.8 GB/step XLA bytes, cavity b8
                                       # 26.4→27.1 steps/s, b32 245→253
                                       # solves/s, poly 8.1→8.36 steps/s.
                                       # Forward + loss-grad equivalence
                                       # tested vs the vmapped integrator.
    fv_ell: bool = False               # block engine + fv_packed: apply
                                       # the low-degree FV operators
                                       # (n2c/n2f/c2n/flux, 2-12 nnz/row)
                                       # through ELL k-take + fma tables
                                       # instead of dense-tile matmuls.
                                       # The dense blocks inflate these
                                       # operators ~100× over their nnz
                                       # and their slice-prefetch reads
                                       # are the step's dominant HBM
                                       # traffic (bytes budget); k
                                       # row-takes of the packed operand
                                       # read O(k·rows) bytes. WLSQ stays
                                       # dense-tile (band-dense stencil).
                                       # MEASURED AND KEPT OFF: −5.2
                                       # GB/step logical traffic but ~0.5
                                       # ms SLOWER (cavity b8 27.1→26.6
                                       # steps/s, poly 8.35→8.09) — the
                                       # dense blocks reads were fully
                                       # prefetch-overlapped (free),
                                       # while the ELL takes' gather
                                       # throughput sits on the critical
                                       # path. The controlled experiment
                                       # also disproves the "bandwidth-
                                       # saturated" roofline reading: see
                                       # ROUND_NOTES.
    wlsq_block_rows: str = "grad"      # {"grad", "full"}: fold only the
                                       # gradient rows (q=0,1) of the WLSQ
                                       # solve into the block operator, or
                                       # all k rows (Hessians — needed for
                                       # LSFD on the block engine; ~k/2×
                                       # the wlsq operator traffic)
    node_agg: str = "composed"         # block engine NodeBlock aggregation:
                                       # "composed" (default: the adj@scat
                                       # products are precomputed per mesh —
                                       # one wide 128-lane apply per half, no
                                       # intermediate agg stream, no lane
                                       # split; fastest with the Pallas
                                       # streaming spmm), "split" (lane-split
                                       # halves, two 64-lane scats, then
                                       # adj — the round-2 formulation), or
                                       # "wide" (two 128-lane scats, N-side
                                       # slice+add, then adj). Same math and
                                       # parameter tree (equivalence-tested);
                                       # A/B table in ROUND_NOTES round-3.
    edge_gather: str = "take"          # block engine EdgeBlock Gathered
                                       # projections: "take" (row-gather of
                                       # the node-side projections; default)
                                       # or "composed" (gsadj/gradj = G@adj
                                       # operators, two direct E←N windowed
                                       # applies, adj apply leaves the model
                                       # path). Same math; "composed"
                                       # measured 0.56 ms/step SLOWER on the
                                       # bench cavity (the composed windows
                                       # are wider than adj's), kept as a
                                       # capability for meshes where the
                                       # take glue dominates.
    microbatch: int = 8                # block engine: PER-DEVICE chunk
                                       # size — batches above
                                       # microbatch×dp_devices run as
                                       # sequential gradient-accumulation
                                       # chunks inside the jitted step.
                                       # 8 is the measured single-chip
                                       # throughput peak; above it XLA
                                       # lowers the vmapped gathers to
                                       # serialized while-loops (the
                                       # round-2 cliff). 0 disables.
                                       # Chunking is exact: mean of
                                       # equal-size chunk grads, with the
                                       # whole-batch normalizer
                                       # accumulation hoisted before the
                                       # chunk loop.
    bucket_tiers: bool = False         # segment engine: per-size padding tiers
                                       # (batches stay within a tier) instead of
                                       # one bucket padded to the largest case
    mixed_case_batches: bool = False   # block engine: sample batches from ONE
                                       # global permutation across ALL cases
                                       # (reference SharedSampler parity,
                                       # Graph_loader.py:786-828) instead of
                                       # stratifying batches per case. Each
                                       # batch is split into per-case groups
                                       # (shared StaticPack per group) and the
                                       # gradient is the EXACT weighted sum of
                                       # group gradients — same batch-mean
                                       # gradient the reference computes, at a
                                       # few extra dispatches per step.

    @property
    def edge_input_size(self) -> int:
        # relative x (node_input_size) + relative pos (2) + |relative pos| (1).
        # Parity: importer.py:25 / importer.py:54-78.
        return self.node_input_size + 3

    @property
    def wlsq_dim(self) -> int:
        return {"1st": 2, "2nd": 5, "3rd": 9, "4th": 14}[self.order]

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        data = json.loads(text)
        fields = {f.name for f in dataclasses.fields(Config)}
        return Config(**{k: v for k, v in data.items() if k in fields})


def load_config(path: str) -> Config:
    with open(path, "rt") as f:
        return Config.from_json(f.read())


def save_config(cfg: Config, path: str) -> None:
    with open(path, "wt") as f:
        f.write(cfg.to_json())
