"""3D vector elasticity (cantilever, C=3 coupled channels) with the MG
preconditioner on real TPU — validates multigrid's cross-channel probed
coarsening at ~0.3M DOF and compares against Jacobi.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")


def main():
    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov, multigrid
    from metafem.linsolve.block_offset import OffsetMatrix

    LW = 5
    e_number = 20
    L_box = 1.0
    size = (L_box * LW, L_box, L_box)
    nel = (int(e_number * LW / 4), e_number, e_number)
    vert, conn = mf.make_brick(size, nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps_g = L_box / e_number * 0.01
    left = mf.select_facets(geo, lambda c: c[:, 0] < eps_g)
    right = mf.select_facets(geo, lambda c: c[:, 0] > size[0] - eps_g)
    bg_fix = dom.add_boundary(wp, left)
    bg_load = dom.add_boundary(wp, right)
    E, nu = 1.0, 0.3
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    d = dom.internal_var("d")
    sl = dom.external_var("sl", "CONTROLPOINT_VAR", "SYMMETRIC_TENSOR")
    n = dom.sym("n")
    delta = dom.sym("delta")
    i, j, m = mf.indices("i j m")
    eps = dom.define("eps", [i, j], (d[i].d(j) + d[j].d(i)) / 2.0)
    sig = dom.define("sig", [i, j],
                     lam * delta[i, j] * eps[m, m] + 2.0 * mu * eps[i, j])
    dom.assign_workpiece_weakform(wp, -Bilinear(eps[i, j], sig[i, j]))
    dom.assign_boundary_weakform(wp, bg_fix,
                                 1e3 * E * Bilinear(d[i], -d[i]))
    dom.assign_boundary_weakform(wp, bg_load,
                                 Bilinear(d[i], sl[i, j] * n[j]))
    dom.initialize_local_assembly()
    t0 = time.perf_counter()
    dom.mesh_classical(itp_order=2, itg_order=3, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    print(f"host setup: {time.perf_counter()-t0:.0f}s", flush=True)
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "sl3", np.full(mesh.n_cp, 1e-4))   # shear sigma_xy
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 1e-6

    lo = dom.pattern.offset_layout
    nnz = lo.storage_of_slot.size
    in_dense = int((lo.storage_of_slot < lo.n_dense).sum())
    print("n dof:", dom.pattern.basicfield_size,
          "lattice:", mesh.lattice_shape,
          f"segments: {len(lo.segments)} dense frac {in_dense/nnz:.3f} "
          f"coo {lo.n_coo}", flush=True)
    fm = dom._fast_maps
    print("fast:", {pk: {k: len(v) for k, v in ph.items()}
                    for pk, ph in fm.items() if pk in ('lin', 'nl')},
          flush=True)

    # tangent + direct MG vs Jacobi comparison
    dom.time_discretization.update_time(1.0, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    jax.block_until_ready(A.vals)

    hier = multigrid.hierarchy_for_domain(dom)
    print("hier:", hier.shapes, "C =", hier.channels, flush=True)
    mask = multigrid.mask_for_domain(dom)
    t0 = time.perf_counter()
    mg_state = jax.jit(
        lambda A, m: multigrid.mg_setup(hier, A, m))(A, mask)
    jax.block_until_ready(mg_state)
    print(f"mg_setup compile+run: {time.perf_counter()-t0:.0f}s",
          flush=True)
    op = multigrid.MGOperator(A, mg_state, hier)
    sol = jax.jit(lambda op, b: krylov.bicgstab(op, b, tol=1e-7,
                                                maxiter=60))
    y, iters, res = sol(op, residue)
    x = op.apply_m(y)
    tr = float(jnp.linalg.norm(residue - A.mv(x))
               / np.sqrt(residue.shape[0]))
    print(f"bicgstab(MG): iters={int(iters)} rec={float(res):.2e} "
          f"true={tr:.2e}", flush=True)

    from metafem.linsolve.precond import pr_jacobi
    Aj, _ = pr_jacobi(A, None)
    solj = jax.jit(lambda A, b: krylov.bicgstabl(A, b, tol=1e-7,
                                                 maxiter=600, s=4))
    yj, itj, rj = solj(Aj, residue)
    print(f"bicgstabl(4, Jacobi): iters={int(itj)} rec={float(rj):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
