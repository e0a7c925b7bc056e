from gen_fvgn_tpu.training.normalizer import NormalizerState, init_normalizer
from gen_fvgn_tpu.training.forward import forward_batch, ForwardOutputs
from gen_fvgn_tpu.training.train import (
    TrainState, init_train_state, make_train_step, step_exp_lr)

__all__ = [
    "NormalizerState", "init_normalizer", "forward_batch", "ForwardOutputs",
    "TrainState", "init_train_state", "make_train_step", "step_exp_lr",
]
