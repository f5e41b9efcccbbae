"""Probe: MG-preconditioned Newton step at 1M DOF (f32, real TPU).

Measures (a) mg_setup cost, (b) V-cycle cost, (c) BiCGStab(MG) iteration
count and time to the converge_tol that Jacobi-preconditioned Krylov
could not reach at this scale (PERFORMANCE.md), (d) the full jitted
Newton step with precond='mg'.
"""

import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov, multigrid
    from metafem.linsolve.block_offset import OffsetMatrix

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
    print("n dof:", dom.pattern.basicfield_size, flush=True)

    # tangent at the initial state
    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    jax.block_until_ready(A.vals)

    hier = multigrid.hierarchy_for_domain(dom)
    print("hier shapes:", hier.shapes, flush=True)
    mask = multigrid.mask_for_domain(dom)

    if mask is not None:
        setup = jax.jit(lambda A, mk: multigrid.mg_setup(hier, A, mk))
    else:
        setup = jax.jit(lambda A, mk: multigrid.mg_setup(hier, A, None))
    t0 = time.perf_counter()
    mg_state = setup(A, mask)
    jax.block_until_ready(mg_state)
    print(f"mg_setup compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        mg_state = setup(A, mask)
        jax.block_until_ready(mg_state)
        print(f"mg_setup: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    vc = jax.jit(lambda st, b: multigrid.vcycle(hier, st, b))
    b = residue
    x = vc(mg_state, b)
    jax.block_until_ready(x)
    for _ in range(3):
        t0 = time.perf_counter()
        x = vc(mg_state, b)
        jax.block_until_ready(x)
        print(f"vcycle: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # MG-preconditioned BiCGStab
    op = multigrid.MGOperator(A, mg_state, hier)
    sol = jax.jit(lambda op, b: krylov.bicgstab(op, b, tol=1e-5,
                                                maxiter=100))
    y, iters, res = sol(op, b)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y, iters, res = sol(op, b)
    jax.block_until_ready(y)
    dt_solve = time.perf_counter() - t0
    xsol = op.apply_m(y)
    rtrue = float(jnp.linalg.norm(b - A.mv(xsol))
                  / np.sqrt(b.shape[0]))
    print(f"bicgstab(MG): iters={int(iters)} res={float(res):.3e} "
          f"true={rtrue:.3e} time={dt_solve*1e3:.1f} ms", flush=True)

    # full jitted Newton step
    dom.converge_tol = 5e-4
    step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=40,
                                max_newton=3, max_pass=1, precond="mg")
    st = dom._runtime_state()
    x_new, dx, res, it = step(st, dom.x, jnp.float32(0.0), jnp.float32(1.0))
    jax.block_until_ready(x_new)
    print(f"step warm: res={float(res):.3e} newton={int(it)}", flush=True)
    for trial in range(3):
        x1 = dom.x * np.float32(1.0 + 1e-4 * (trial + 1))
        jax.block_until_ready(x1)
        t0 = time.perf_counter()
        x_new, dx, res, it = step(st, x1, jnp.float32(0.0),
                                  jnp.float32(1.0))
        r = float(res)
        dt_step = time.perf_counter() - t0
        print(f"full newton step: {dt_step*1e3:.1f} ms res={r:.3e} "
              f"newton={int(it)}", flush=True)


if __name__ == "__main__":
    main()
