from gen_fvgn_tpu.meshes.comsol import parse_mphtxt, comsol_to_mesh
from gen_fvgn_tpu.meshes.geometry import compile_mesh, k_hop_edges, unique_faces
from gen_fvgn_tpu.meshes.hdf5 import read_mesh_h5, write_mesh_h5
from gen_fvgn_tpu.meshes.bc import load_bc, generate_theta_combinations

__all__ = [
    "parse_mphtxt",
    "comsol_to_mesh",
    "compile_mesh",
    "k_hop_edges",
    "unique_faces",
    "read_mesh_h5",
    "write_mesh_h5",
    "load_bc",
    "generate_theta_combinations",
]
