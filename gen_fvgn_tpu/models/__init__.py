from gen_fvgn_tpu.models.simulator import make_simulator

__all__ = ["make_simulator"]
