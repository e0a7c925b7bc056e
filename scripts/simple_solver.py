"""Traditional 2nd-order finite-volume SIMPLE solver — the DENOMINATOR for
the reference's headline claim (README.md:10: the learned solver reaches a
steady flow in ~25% of a traditional 2nd-order CFD solver's iterations).

A standard collocated unstructured SIMPLE (Ferziger & Peric) on the SAME
mesh / Reynolds number as scripts/steady_cylinder.py's learned-solver run:

* cell-centered u, v, p; weighted least-squares cell gradients (2nd order);
* momentum: implicit upwind convection + explicit deferred central
  correction (2nd-order), over-relaxed orthogonal diffusion with explicit
  non-orthogonal correction, implicit under-relaxation;
* Rhie-Chow face fluxes; pressure-correction Poisson solve; standard
  p/u/flux corrections (alpha_u=0.7, alpha_p=0.3 defaults);
* sparse direct solves (scipy splu) — this script is a MEASUREMENT tool,
  not a performance product; iterations are the quantity of record.

Comparability: every `--metric-every` outer iterations the cell field is
area-weight interpolated to the nodes (boundary values pinned to the BCs)
and the framework's OWN continuity metric is evaluated — the identical
`integrate_residuals` loss_cont (sqrt of sum of squared cell net fluxes,
fv/integrator.py) that the learned-solver curve in
docs_assets_steady_cylinder_re100.json reports. Crossing `cont < 0.01` on
the same functional on the same mesh makes the two iteration counts
directly comparable.

Usage:
    python scripts/simple_solver.py --re 100 \
        --out docs_assets_simple_cylinder_re100.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

CASE = "/root/reference/mesh_example/cylinder_flow_tri_quad"

# NodeType codes (gen_fvgn_tpu/utils/types.py — reference parity values)
NORMAL, INFLOW, OUTFLOW, WALL = 0, 1, 2, 3


class FvMesh:
    """Face-based connectivity + geometry distilled from the compiled mesh
    dict (meshes/geometry.py::compile_mesh schema)."""

    def __init__(self, mesh):
        self.pos = mesh["node|pos"].astype(np.float64)
        self.centroid = mesh["cell|centroid"].astype(np.float64)
        self.vol = mesh["cell|cells_area"].astype(np.float64)
        self.face_node = mesh["face|face_node"].astype(np.int64)
        self.face_center = mesh["face|face_center_pos"].astype(np.float64)
        self.face_area = mesh["face|face_area"].reshape(-1).astype(np.float64)
        self.face_type = np.asarray(mesh["face|face_type"]).reshape(-1)
        nc = mesh["face|neighbour_cell"].astype(np.int64)
        self.nc = self.centroid.shape[0]
        self.nf = self.face_node.shape[1]

        # owner/neighbour; boundary face when both slots name the same cell
        self.own = nc[0].copy()
        self.nb = nc[1].copy()
        self.interior = self.own != self.nb
        self.boundary = ~self.interior

        # unit normal oriented OUT of the owner cell, times area
        d = self.pos[self.face_node[1]] - self.pos[self.face_node[0]]
        n = np.stack([d[:, 1], -d[:, 0]], axis=1)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        to_nb = np.where(
            self.interior[:, None],
            self.centroid[self.nb] - self.centroid[self.own],
            self.face_center - self.centroid[self.own])
        flip = np.sum(n * to_nb, axis=1) < 0
        n[flip] = -n[flip]
        self.sf = n * self.face_area[:, None]          # area vector
        self.nhat = n

        # owner->neighbour distances (owner->face center on the boundary)
        self.delta = np.where(self.interior,
                              np.linalg.norm(to_nb, axis=1),
                              np.maximum(np.sum(to_nb * n, axis=1), 1e-12))
        # node<-cell incidence for the metric interpolation: inverse-
        # distance weights + per-pair displacement for gradient-corrected
        # (2nd-order) node values — a plain cell average leaves an O(h)
        # interpolation floor in the framework's continuity functional
        # that has nothing to do with the solver's convergence
        cn = mesh["cells_node"].astype(np.int64)
        ci = mesh["cells_index"].astype(np.int64)
        dxp = self.pos[cn] - self.centroid[ci]               # [K, 2]
        w = 1.0 / np.maximum(np.linalg.norm(dxp, axis=1), 1e-12)
        nn = self.pos.shape[0]
        wsum = np.zeros(nn)
        np.add.at(wsum, cn, w)
        self._ni_cn, self._ni_ci = cn, ci
        self._ni_w = w / wsum[cn]
        self._ni_dx = dxp
        self.node_type = np.asarray(mesh["node|node_type"]).reshape(-1)

    def to_nodes(self, phi, gphi=None):
        """Inverse-distance node interpolation, optionally gradient-
        corrected: Σ w (phi_c + ∇phi_c · (x_n − x_c))."""
        vals = phi[self._ni_ci]
        if gphi is not None:
            vals = vals + np.sum(gphi[self._ni_ci] * self._ni_dx, axis=1)
        out = np.zeros(self.pos.shape[0])
        np.add.at(out, self._ni_cn, self._ni_w * vals)
        return out

    def lsq_gradients(self, bval_fn):
        """Precompute the weighted-LSQ gradient operator: per cell, the
        2x2 normal-equation inverse over (interior neighbour centroids +
        boundary face centers), 1/d^2 weights. Returns grad(phi, bval)
        -> [nc, 2]. bval_fn is unused here (values enter per call)."""
        rows_i = np.concatenate([self.own[self.interior],
                                 self.nb[self.interior]])
        # displacement owner->neighbour and neighbour->owner
        dx_i = np.concatenate([
            self.centroid[self.nb[self.interior]]
            - self.centroid[self.own[self.interior]],
            self.centroid[self.own[self.interior]]
            - self.centroid[self.nb[self.interior]]])
        rows_b = self.own[self.boundary]
        dx_b = self.face_center[self.boundary] - self.centroid[rows_b]
        rows = np.concatenate([rows_i, rows_b])
        dx = np.concatenate([dx_i, dx_b])
        w = 1.0 / np.maximum(np.sum(dx * dx, axis=1), 1e-300)
        # per-cell 2x2 A = sum w dx dx^T, inverted once
        A = np.zeros((self.nc, 2, 2))
        np.add.at(A, rows, w[:, None, None] * dx[:, :, None] * dx[:, None, :])
        det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
        inv = np.empty_like(A)
        inv[:, 0, 0] = A[:, 1, 1]
        inv[:, 1, 1] = A[:, 0, 0]
        inv[:, 0, 1] = -A[:, 0, 1]
        inv[:, 1, 0] = -A[:, 1, 0]
        inv /= np.maximum(det, 1e-300)[:, None, None]
        self._g_rows, self._g_dx, self._g_w, self._g_inv = rows, dx, w, inv
        ni = int(self.interior.sum())
        self._g_nbrval_idx = (np.concatenate([self.nb[self.interior],
                                              self.own[self.interior]]), ni)

    def grad(self, phi, bval):
        """LSQ gradient of cell field phi with boundary-face values bval
        (one per boundary face, in boundary-face order)."""
        nbr_idx, ni = self._g_nbrval_idx
        dphi = np.concatenate([
            phi[nbr_idx[:ni]] - phi[self.own[self.interior]],
            phi[nbr_idx[ni:]] - phi[self.nb[self.interior]],
            bval - phi[self.own[self.boundary]]])
        rhs = np.zeros((self.nc, 2))
        np.add.at(rhs, self._g_rows,
                  (self._g_w * dphi)[:, None] * self._g_dx)
        return np.einsum("cij,cj->ci", self._g_inv, rhs)


def face_boundary_values(m, ub, vb, phi_u, phi_v, p):
    """(u, v, p) at the boundary faces: Dirichlet velocity on inflow/wall,
    zero-gradient at outflow; p zero-gradient except outflow p=0."""
    bf = np.where(m.boundary)[0]
    tb = m.face_type[bf]
    uo, vo = phi_u[m.own[bf]], phi_v[m.own[bf]]
    ub_f = np.where(tb == OUTFLOW, uo, ub[bf])
    vb_f = np.where(tb == OUTFLOW, vo, vb[bf])
    pb_f = np.where(tb == OUTFLOW, 0.0, p[m.own[bf]])
    return ub_f, vb_f, pb_f


def simple_solve(mesh, u_in, rho, mu, alpha_u=0.7, alpha_p=0.3,
                 max_iter=4000, metric_fn=None, metric_every=5,
                 cont_target=0.01, central_blend=0.9, verbose=True):
    m = FvMesh(mesh)
    m.lsq_gradients(None)
    nc, nf = m.nc, m.nf
    bf = np.where(m.boundary)[0]
    itf = np.where(m.interior)[0]
    tb = m.face_type[bf]

    # boundary Dirichlet velocity per boundary face
    ub = np.zeros(nf)
    vb = np.zeros(nf)
    ub[bf] = np.where(tb == INFLOW, u_in, 0.0)

    u = np.full(nc, u_in)
    v = np.zeros(nc)
    p = np.zeros(nc)

    # initial mass fluxes from the uniform field
    flux = rho * (u_in * m.sf[:, 0])
    flux[bf[tb == WALL]] = 0.0

    geo_orth = m.face_area / m.delta                    # |S|/d
    t0 = time.time()
    history, crossings = [], {}
    u_prev, v_prev = u.copy(), v.copy()
    m_in = -np.sum(np.minimum(flux[bf], 0.0))           # inlet mass flow

    for it in range(1, max_iter + 1):
        ub_f, vb_f, pb_f = face_boundary_values(m, ub, vb, u, v, p)
        gu = m.grad(u, ub_f)
        gv = m.grad(v, vb_f)
        gp = m.grad(p, pb_f)

        # ---- momentum assembly (shared coefficients for u and v) ----
        dcoef = mu * geo_orth                           # orthogonal diffusion
        fo = flux[itf]
        # upwind convection: owner gets max(F,0) outflowing, etc.
        a_on = -dcoef[itf] - np.maximum(-fo, 0.0)       # owner row, nb col
        a_no = -dcoef[itf] - np.maximum(fo, 0.0)        # nb row, owner col
        diag = np.zeros(nc)
        np.add.at(diag, m.own[itf], dcoef[itf] + np.maximum(fo, 0.0))
        np.add.at(diag, m.nb[itf], dcoef[itf] + np.maximum(-fo, 0.0))

        su = np.zeros(nc)
        sv = np.zeros(nc)
        # boundary faces: Dirichlet velocity (wall/inflow) adds diffusion +
        # upwind inflow flux; outflow is zero-gradient (convective outflow
        # implicit via flux>0 into diag)
        dir_b = bf[tb != OUTFLOW]
        np.add.at(diag, m.own[dir_b],
                  dcoef[dir_b] + np.maximum(-flux[dir_b], 0.0))
        su_b = (dcoef[dir_b] + np.maximum(-flux[dir_b], 0.0)) * ub_f[
            tb != OUTFLOW]
        sv_b = (dcoef[dir_b] + np.maximum(-flux[dir_b], 0.0)) * vb_f[
            tb != OUTFLOW]
        np.add.at(su, m.own[dir_b], su_b)
        np.add.at(sv, m.own[dir_b], sv_b)
        out_b = bf[tb == OUTFLOW]
        np.add.at(diag, m.own[out_b], np.maximum(flux[out_b], 0.0))

        # deferred 2nd-order central correction (explicit):
        # F*(phi_central - phi_upwind)
        w_lin = 0.5
        phi_u_c = w_lin * (u[m.own[itf]] + u[m.nb[itf]])
        phi_v_c = w_lin * (v[m.own[itf]] + v[m.nb[itf]])
        up_idx = np.where(fo >= 0, m.own[itf], m.nb[itf])
        corr_u = central_blend * fo * (phi_u_c - u[up_idx])
        corr_v = central_blend * fo * (phi_v_c - v[up_idx])
        np.add.at(su, m.own[itf], -corr_u)
        np.add.at(su, m.nb[itf], corr_u)
        np.add.at(sv, m.own[itf], -corr_v)
        np.add.at(sv, m.nb[itf], corr_v)

        # non-orthogonal diffusion correction (explicit, over-relaxed):
        # mu * (grad_f . (S - |S| e_d)) where e_d is the P->N unit vector
        e_d = np.zeros((nf, 2))
        e_d[itf] = (m.centroid[m.nb[itf]] - m.centroid[m.own[itf]]) \
            / m.delta[itf, None]
        t_vec = m.sf - m.face_area[:, None] * e_d
        gu_f = 0.5 * (gu[m.own[itf]] + gu[m.nb[itf]])
        gv_f = 0.5 * (gv[m.own[itf]] + gv[m.nb[itf]])
        ncu = mu * np.sum(gu_f * t_vec[itf], axis=1)
        ncv = mu * np.sum(gv_f * t_vec[itf], axis=1)
        np.add.at(su, m.own[itf], ncu)
        np.add.at(su, m.nb[itf], -ncu)
        np.add.at(sv, m.own[itf], ncv)
        np.add.at(sv, m.nb[itf], -ncv)

        # pressure gradient source
        su -= gp[:, 0] * m.vol
        sv -= gp[:, 1] * m.vol

        # implicit under-relaxation
        ap = diag / alpha_u
        su += (1.0 - alpha_u) / alpha_u * diag * u
        sv += (1.0 - alpha_u) / alpha_u * diag * v

        A = sp.csr_matrix(
            (np.concatenate([ap,
                             a_on, a_no]),
             (np.concatenate([np.arange(nc), m.own[itf], m.nb[itf]]),
              np.concatenate([np.arange(nc), m.nb[itf], m.own[itf]]))),
            shape=(nc, nc))
        lu = spla.splu(A.tocsc())
        u_star = lu.solve(su)
        v_star = lu.solve(sv)

        # ---- Rhie-Chow face fluxes ----
        df_cell = m.vol / ap
        df = np.zeros(nf)
        df[itf] = 0.5 * (df_cell[m.own[itf]] + df_cell[m.nb[itf]])
        ub_f, vb_f, pb_f = face_boundary_values(m, ub, vb, u_star, v_star, p)
        gu_s = m.grad(u_star, ub_f)  # noqa: F841 (parity with texts; unused)
        uf = 0.5 * (u_star[m.own[itf]] + u_star[m.nb[itf]])
        vf = 0.5 * (v_star[m.own[itf]] + v_star[m.nb[itf]])
        gp_f = 0.5 * (gp[m.own[itf]] + gp[m.nb[itf]])
        dpdn = (p[m.nb[itf]] - p[m.own[itf]]) / m.delta[itf]
        rc = df[itf] * m.face_area[itf] * (
            dpdn - np.sum(gp_f * e_d[itf], axis=1))
        flux_new = np.zeros(nf)
        flux_new[itf] = rho * (uf * m.sf[itf, 0] + vf * m.sf[itf, 1] - rc)
        # boundary: inflow fixed, wall zero, outflow from owner velocity
        flux_new[bf] = rho * (ub_f * m.sf[bf, 0] + vb_f * m.sf[bf, 1])
        wall_b = bf[tb == WALL]
        flux_new[wall_b] = 0.0
        out_bf = bf[tb == OUTFLOW]
        flux_new[out_bf] = rho * (
            u_star[m.own[out_bf]] * m.sf[out_bf, 0]
            + v_star[m.own[out_bf]] * m.sf[out_bf, 1])
        # global mass balance: scale outflow to match inflow exactly
        m_in = -np.sum(np.minimum(flux_new[bf], 0.0))
        m_out = np.sum(np.maximum(flux_new[out_bf], 0.0))
        if m_out > 1e-300:
            pos_mask = flux_new[out_bf] > 0
            flux_new[out_bf[pos_mask]] *= m_in / m_out
        flux = flux_new

        # ---- pressure correction ----
        ap_coef = rho * df[itf] * geo_orth[itf]
        diag_p = np.zeros(nc)
        np.add.at(diag_p, m.own[itf], ap_coef)
        np.add.at(diag_p, m.nb[itf], ap_coef)
        # fix p'=0 at outflow-owner cells via a large diagonal (reference
        # pressure + keeps the Poisson system non-singular)
        imb = np.zeros(nc)
        np.add.at(imb, m.own, flux)
        np.add.at(imb, m.nb[itf], -flux[itf])
        big = diag_p.max() * 1e6
        fix = np.zeros(nc)
        fix[m.own[out_bf]] = big
        Ap = sp.csr_matrix(
            (np.concatenate([diag_p + fix, -ap_coef, -ap_coef]),
             (np.concatenate([np.arange(nc), m.own[itf], m.nb[itf]]),
              np.concatenate([np.arange(nc), m.nb[itf], m.own[itf]]))),
            shape=(nc, nc))
        pc = spla.splu(Ap.tocsc()).solve(-imb)

        # ---- corrections ----
        p += alpha_p * pc
        gpc = m.grad(pc, np.where(m.face_type[bf] == OUTFLOW, 0.0,
                                  pc[m.own[bf]]))
        u = u_star - df_cell * gpc[:, 0]
        v = v_star - df_cell * gpc[:, 1]
        flux[itf] += ap_coef * (pc[m.own[itf]] - pc[m.nb[itf]])

        # solver-side convergence measures: scaled mass imbalance (the
        # standard SIMPLE residual) + max velocity change (steady
        # detection); m_in is the true inlet mass flow
        mass_res = np.abs(imb).sum() / max(m_in, 1e-300)
        du = max(np.abs(u - u_prev).max(), np.abs(v - v_prev).max()) / u_in
        u_prev, v_prev = u.copy(), v.copy()
        rec = {"iter": it, "mass_imbalance": float(mass_res),
               "delta_u": float(du)}
        for th in (1e-2, 1e-3, 1e-4):
            key = f"mass<{th:g}"
            if mass_res < th and key not in crossings:
                crossings[key] = {"iterations": it,
                                  "wall_s": time.time() - t0}
        if metric_fn is not None and (it % metric_every == 0 or it == 1):
            ub2, vb2, pb2 = face_boundary_values(m, ub, vb, u, v, p)
            cont = metric_fn(m, u, v, p, ub,
                             m.grad(u, ub2), m.grad(v, vb2), m.grad(p, pb2))
            rec["cont"] = float(cont)
            if verbose:
                print(f"iter {it:5d}  mass {mass_res:.3e}  dU {du:.3e}  "
                      f"cont(framework) {cont:.4e}", flush=True)
            key = f"cont<{cont_target:g}"
            if cont < cont_target and key not in crossings:
                crossings[key] = {"iterations": it,
                                  "wall_s": time.time() - t0}
        history.append(rec)
        # stop when fully steady: deep mass convergence + frozen field
        if mass_res < 1e-5 and du < 1e-6:
            break
    return u, v, p, history, crossings


def build_metric(case_dir, theta, pad_multiple=256):
    """The framework's loss_cont functional on a node field — identical
    code path (fv/integrator.py::integrate_residuals) and θ coefficients
    as the learned-solver curve."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.fv.integrator import integrate_residuals
    from gen_fvgn_tpu.training.pool import EnvPool

    cfg = Config(batch_size=1, dataset_size=1, mxu_dtype="float32")
    pool = EnvPool([case_dir], cfg, seed=0, pad_multiple=pad_multiple)
    batch = pool.gather_batch(np.asarray([0]))
    sample = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0], batch)
    tvec = np.asarray(sample.theta).copy()

    @jax.jit
    def cont_of(uvp):
        s = sample
        losses, _, _ = integrate_residuals(
            uvp, uvp[:, 0:2], uvp[:, 0:2], s, order="2nd",
            conserved_form=True, ncn_smooth=False)
        return losses.cont[0]

    n = pool.cases[0]["mesh"]["node|pos"].shape[0]
    n_pad = np.asarray(sample.pos).shape[0]
    node_type = np.asarray(
        pool.cases[0]["mesh"]["node|node_type"]).reshape(-1)

    def metric(m, u, v, p, ub, gu=None, gv=None, gp=None):
        un = m.to_nodes(u, gu)
        vn = m.to_nodes(v, gv)
        pn = m.to_nodes(p, gp)
        # pin boundary nodes to their BC values (the learned field also
        # satisfies the hard BCs at nodes)
        un[node_type == INFLOW] = np.max(ub)
        vn[node_type == INFLOW] = 0.0
        un[node_type == WALL] = 0.0
        vn[node_type == WALL] = 0.0
        uvp = np.zeros((n_pad, 3), np.float32)
        uvp[:n, 0], uvp[:n, 1], uvp[:n, 2] = un, vn, pn
        return float(cont_of(jnp.asarray(uvp)))

    return metric, tvec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", default=CASE)
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--mu", type=float, default=0.01)
    ap.add_argument("--L", type=float, default=0.1)
    ap.add_argument("--max-iter", type=int, default=4000)
    ap.add_argument("--metric-every", type=int, default=5)
    ap.add_argument("--alpha-u", type=float, default=0.7)
    ap.add_argument("--alpha-p", type=float, default=0.3)
    ap.add_argument("--cont-target", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/simple_cylinder.json")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")   # host-side measurement tool

    u_in = args.re * args.mu / (args.rho * args.L)
    print(f"SIMPLE: Re={args.re} -> U_in={u_in} (rho={args.rho}, "
          f"mu={args.mu}, L={args.L})")

    from gen_fvgn_tpu.training.pool import load_case
    case = load_case(args.case, "2nd")
    metric, _ = build_metric(args.case, None)

    t0 = time.time()
    u, v, p, history, crossings = simple_solve(
        case["mesh"], u_in, args.rho, args.mu,
        alpha_u=args.alpha_u, alpha_p=args.alpha_p,
        max_iter=args.max_iter, metric_fn=metric,
        metric_every=args.metric_every, cont_target=args.cont_target)
    wall = time.time() - t0

    conts = [(h["iter"], h["cont"]) for h in history if "cont" in h]
    floor = min(c for _, c in conts)
    within = [i for i, c in conts if c <= 1.1 * floor]
    out = {
        "case": os.path.basename(args.case),
        "solver": "SIMPLE (collocated, Rhie-Chow, 2nd-order deferred "
                  "central + LSQ gradients; scipy splu)",
        "Re": args.re, "u_in": u_in,
        "alpha_u": args.alpha_u, "alpha_p": args.alpha_p,
        "cont_target": args.cont_target,
        "crossings": crossings,
        "framework_cont_floor": floor,
        "framework_cont_floor_reached_iter": within[0] if within else None,
        "iterations_run": history[-1]["iter"],
        "wall_seconds": wall,
        "final_mass_imbalance": history[-1]["mass_imbalance"],
        "final_delta_u": history[-1]["delta_u"],
        "curve": [h for h in history if "cont" in h],
        "note": ("The framework-cont functional is evaluated on the node-"
                 "interpolated SIMPLE field with the IDENTICAL "
                 "integrate_residuals code the learned-solver curve uses. "
                 "SIMPLE drives its own Rhie-Chow discrete divergence to "
                 "zero, a different discretization of the same field, so "
                 "framework-cont floors at the inter-scheme O(h^2) "
                 "mismatch; the crossings on the solver's own residuals "
                 "(mass<1e-3 is the standard engineering criterion) are "
                 "the comparable iteration counts."),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("crossings", "framework_cont_floor",
                       "iterations_run", "wall_seconds")}))


if __name__ == "__main__":
    main()
