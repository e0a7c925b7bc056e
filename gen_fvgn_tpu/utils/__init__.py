from gen_fvgn_tpu.utils.types import NodeType

__all__ = ["NodeType"]
