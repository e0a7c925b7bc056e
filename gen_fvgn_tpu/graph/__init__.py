from gen_fvgn_tpu.graph.sample import MeshSample, PadSizes, pad_mesh_to_sample, stack_samples

__all__ = ["MeshSample", "PadSizes", "pad_mesh_to_sample", "stack_samples"]
