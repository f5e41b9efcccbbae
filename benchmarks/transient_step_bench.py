"""Transient (first-order) thermal stepping at 1M DOF with the
cross-step caches: frozen per-td linear tangent + frozen MG setup.
This is the production time-stepping configuration for static-geometry
problems (pikachu dynamics analog at 1M DOF, structured).
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
    bg = dom.add_boundary(wp, ends)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s)
        - 4.2e6 * Bilinear(T, T.dt()))
    dom.assign_boundary_weakform(wp, bg, 1000.0 * Bilinear(T, 1173.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.dt = 10.0
    dom.converge_tol = 5e-4
    print("n dof:", dom.pattern.basicfield_size,
          "time levels:", dom.pattern.max_time_level + 1, flush=True)

    t0 = time.perf_counter()
    dom.freeze_linear_tangent()
    dom.setup_mg()
    jax.block_until_ready(dom._mg_frozen)
    print(f"one-time freeze (K_td + MG): {time.perf_counter()-t0:.1f}s "
          "(includes compiles)", flush=True)

    for label, kw in [
        ("per-step setup", dict()),
        ("frozen", dict(static_k_linear=True, reuse_mg=True)),
    ]:
        step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=40,
                                    max_newton=3, max_pass=1,
                                    precond="mg", **kw)
        state = dom._runtime_state()
        x_new, dx, res, it = step(state, dom.x, jnp.float32(0.0),
                                  jnp.float32(10.0))
        jax.block_until_ready(x_new)
        ts = []
        for t in range(3):
            x1 = dom.x * np.float32(1.0 + 1e-4 * (t + 1))
            jax.block_until_ready(x1)
            t0 = time.perf_counter()
            _, _, res, it = step(state, x1, jnp.float32(0.0),
                                 jnp.float32(10.0))
            r = float(res)
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {1e3*np.median(ts):.0f} ms  res={r:.2e} "
              f"newton={int(it)}", flush=True)


if __name__ == "__main__":
    main()
