"""gen_fvgn_tpu — a TPU-native JAX framework for data-free, FVM-loss training of
graph neural PDE solvers on unstructured 2D meshes.

Capability-equivalent rebuild of Litianyu141/Gen-FVGN-steady (see SURVEY.md),
re-designed for TPU: static-shape padded mesh buckets, stacked [B, ...] batches
consumed via vmap, segment-op message passing, batched WLSQ solves on the MXU,
and a single jitted train step sharded over a device mesh.
"""

__version__ = "0.1.0"
