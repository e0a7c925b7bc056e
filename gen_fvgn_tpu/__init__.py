"""gen_fvgn_tpu — a TPU-native JAX framework for data-free, FVM-loss training
of graph neural PDE solvers on unstructured 2D meshes.

Capability-equivalent rebuild of Litianyu141/Gen-FVGN-steady (see SURVEY.md
for the structural analysis, PARITY.md for the component map), re-designed
for TPU: static-shape padded mesh buckets, stacked [B, ...] batches consumed
via vmap, a block-sparse dense-tile operator engine that runs every graph
transfer as batched MXU matmuls, and a single jitted train step sharded over
a device mesh.

Main entry points:
    from gen_fvgn_tpu import Config, train
    state = train(Config(engine="block"), case_dirs=[...])

    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)
"""

from gen_fvgn_tpu.config import Config, load_config, save_config

__version__ = "0.1.0"


def train(*args, **kwargs):
    from gen_fvgn_tpu.training.loop import train as _train
    return _train(*args, **kwargs)


__all__ = ["Config", "load_config", "save_config", "train", "__version__"]
