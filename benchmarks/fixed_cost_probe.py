"""Pin down the ~1.8s fixed per-step cost: time k_linear, res_k, the
newton=0 step (k_linear + predictor-residual [+ mg_setup]) for both
preconditioner paths, with honest per-call timing (fresh perturbed
inputs, scalar readbacks).
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
    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    print("n dof:", dom.pattern.basicfield_size, flush=True)

    k_linear = dom._k_linear.__wrapped__
    res_k = dom._res_k.__wrapped__

    def timed(fn, label, *args):
        f = jax.jit(fn)
        float(f(state, *args))
        ts = []
        for t in range(3):
            st2 = dict(state)
            st2["x_star"] = dom.x * np.float32(1.0 + 1e-4 * (t + 1))
            jax.block_until_ready(st2["x_star"])
            t0 = time.perf_counter()
            r = float(f(st2, *args))
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {1e3*np.median(ts):.0f} ms", flush=True)

    timed(lambda st: k_linear(st)[0], "k_linear")
    timed(lambda st: res_k(st)[1][0] + res_k(dict(st))[0][0],
          "res_k x2")

    def both(st):
        kl = k_linear(st)
        st2 = dict(st)
        st2["K_linear"] = kl
        residue, K = res_k(st2)
        return K[0] + residue[0]
    timed(both, "k_linear + res_k composed")

    for precond in ("jacobi", "mg"):
        step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=1,
                                    max_newton=0, max_pass=1,
                                    precond=precond)
        f = step
        x_new, dx, res, it = f(state, dom.x, jnp.float32(0.0),
                               jnp.float32(1.0))
        jax.block_until_ready(x_new)
        ts = []
        for t in range(3):
            x1 = dom.x * np.float32(1.0 + 1e-4 * (t + 1))
            jax.block_until_ready(x1)
            t0 = time.perf_counter()
            _, _, res, _ = f(state, x1, jnp.float32(0.0), jnp.float32(1.0))
            float(res)
            ts.append(time.perf_counter() - t0)
        print(f"step newton=0 ({precond}): {1e3*np.median(ts):.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
