"""WLSQ gradient-reconstruction accuracy report (parity:
src/grad_rec_acc_test.py): reconstruct the analytic scalar field's gradient +
Hessian on a real mesh, print relative-L2 / MSE per order, and export error
fields + condition numbers to VTU for visual inspection.

Usage:
    python scripts/grad_rec_acc_test.py [--case <dir>] [--orders 1st 2nd ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", default="/root/reference/mesh_example/poisson/"
                                      "cavity_poisson_81x81")
    ap.add_argument("--orders", nargs="+",
                    default=["1st", "2nd", "3rd", "4th"])
    ap.add_argument("--k-hop", type=int, default=2)
    ap.add_argument("--out-dir", default="grad_rec_out")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.meshes.comsol import comsol_to_mesh
    from gen_fvgn_tpu.meshes.geometry import build_stencil, compile_mesh
    from gen_fvgn_tpu.io.vtu import write_vtu_2d
    from gen_fvgn_tpu.ops.wlsq import node_based_wlsq, wlsq_moments
    from gen_fvgn_tpu.utils.analytic import eval_field

    mphtxt = [f for f in os.listdir(args.case) if f.endswith(".mphtxt")][0]
    mesh = compile_mesh(comsol_to_mesh(os.path.join(args.case, mphtxt)))
    pos = mesh["node|pos"].astype(np.float32)
    stencil = build_stencil(mesh["face|face_node"], mesh["face_node_x"],
                            pos.shape[0], k_hop=args.k_hop).astype(np.int32)
    phi, grad, hess = eval_field(mesh["node|pos"])

    def rel_l2(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    for order in args.orders:
        A, B, cs = wlsq_moments(pos, stencil, order)
        nabla, cond = node_based_wlsq(phi.astype(np.float32), stencil, A, B,
                                      order, colscale=cs, rt_cond=True)
        nabla = np.asarray(nabla)
        g = nabla[:, 0, 0:2]
        print(f"[{order}] grad rel-L2 = {rel_l2(g, grad):.5e}  "
              f"MSE = {float(np.mean((g - grad) ** 2)):.5e}  "
              f"cond(med/max) = {float(np.median(cond)):.3g}/"
              f"{float(np.max(cond)):.3g}")
        if order != "1st":
            hxx, hyy, hxy = nabla[:, 0, 2], nabla[:, 0, 3], nabla[:, 0, 4]
            print(f"        hess rel-L2: xx={rel_l2(hxx, hess[:, 0, 0]):.4e} "
                  f"yy={rel_l2(hyy, hess[:, 1, 1]):.4e} "
                  f"xy={rel_l2(hxy, hess[:, 0, 1]):.4e}")
        write_vtu_2d(
            os.path.join(args.out_dir, f"grad_err_{order}.vtu"),
            mesh["node|pos"], mesh["cells_node"], mesh["cells_index"],
            point_data={
                "grad_err": np.linalg.norm(g - grad, axis=1),
                "cond": np.asarray(cond),
                "phi": phi[:, 0],
            })


if __name__ == "__main__":
    main()
