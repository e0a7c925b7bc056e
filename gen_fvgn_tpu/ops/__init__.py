from gen_fvgn_tpu.ops.segment import (
    segment_sum, segment_mean, masked_mean_var, safe_sqrt)
from gen_fvgn_tpu.ops.wlsq import (
    taylor_basis, odd_sign_vector, wlsq_moments, node_based_wlsq, WLSQ_DIM)
from gen_fvgn_tpu.ops import interp

__all__ = [
    "segment_sum", "segment_mean", "masked_mean_var", "safe_sqrt",
    "taylor_basis", "odd_sign_vector", "wlsq_moments", "node_based_wlsq",
    "WLSQ_DIM", "interp",
]
