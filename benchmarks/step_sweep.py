"""Marginal-cost sweep of the jitted MG Newton step at 1M DOF:
time step variants (max_newton x maxiter) and difference them to locate
where the wall-clock goes inside the composed program.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov

    nel = (800, 400)
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    top = mf.select_facets(geo, lambda c: c[:, 1] > L2 - eps)
    bg_fix = dom.add_boundary(wp, ends)
    bg_top = dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    n = dom.sym("n")
    i = mf.index("i")
    T0 = 273.15
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bg_fix, 1000.0 * Bilinear(T, 900.0 + T0 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bg_top, 50.0 * Bilinear(T, 50.0 + T0 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, (50.0 + T0) ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 50.0 + T0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 5e-4
    st = dom._runtime_state()
    print("n dof:", dom.pattern.basicfield_size, flush=True)

    def timed(step, label):
        x_new, dx, res, it = step(st, dom.x, jnp.float32(0.0),
                                  jnp.float32(1.0))
        jax.block_until_ready(x_new)
        ts = []
        for t in range(3):
            x1 = dom.x * np.float32(1.0 + 1e-4 * (t + 1))
            jax.block_until_ready(x1)
            t0 = time.perf_counter()
            x_new, dx, res, it = step(st, x1, jnp.float32(0.0),
                                      jnp.float32(1.0))
            r = float(res)
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {1e3*np.median(ts):.0f} ms  res={r:.2e} "
              f"newton={int(it)}", flush=True)

    for mn, mi in [(1, 1), (1, 12), (2, 12), (3, 12), (3, 40)]:
        step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=mi,
                                    max_newton=mn, max_pass=1,
                                    precond="mg")
        timed(step, f"newton<={mn} maxiter={mi}")

    # jacobi for comparison
    step = dom.make_jitted_step(sv_func=krylov.bicgstabl, s=4,
                                maxiter=150, max_newton=2, max_pass=1)
    timed(step, "jacobi bicgstabl(4) newton<=2 maxiter=150")


if __name__ == "__main__":
    main()
