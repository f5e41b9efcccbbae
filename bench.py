"""Benchmark entry point (driver contract): prints ONE JSON line.

Measures the hot path of the flagship config — the reference's 2D thermal
strip scaled up (examples/thermal_conduction/2D_Script.jl geometry, order-2
serendipity) — as assembled-DOFs/second of the Newton-iteration assembly
kernel (residual + tangent K), the dominant cost of update_OneStep!
(solver/04_Time_Domain.jl:59-80) alongside Krylov SpMV.

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` is reported against a fixed nominal of 1e7 assembled
DOFs/sec (a single-GPU-class figure for this element/quadrature count).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain

    # ~1M DOF (BASELINE.md north star), f32 hot path on TPU
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
    k, h, Tw, h_pen = 3.0, 50.0, 900.0 + T0, 1000.0
    Tenv, em, sb = 50.0 + T0, 0.7, 5.669e-8
    dom.assign_workpiece_weakform(
        wp, -k * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bg_fix, h_pen * Bilinear(T, Tw - T)
        + k * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bg_top, h * Bilinear(T, Tenv - T)
        + em * sb * Bilinear(T, Tenv ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, Tenv))
    dom.refresh_fields()
    dom.assemble_x()

    dom.converge_tol = 5e-4
    from metafem.linsolve import krylov
    step = dom.make_jitted_step(sv_func=krylov.bicgstabl, s=4,
                                maxiter=150, max_newton=2, max_pass=1)
    state = dom._runtime_state()

    # data-dependent chain of FULL Newton steps (assembly + Krylov solve).
    # Timing method: difference of two chain lengths, each ended by a
    # scalar host readback — robust against async dispatch AND against
    # transport-level result caching (fresh perturbed input per run).
    def make_chain(n_steps):
        @jax.jit
        def chained(state, x):
            def body(i, x):
                x_new, dx, res, it = step.__wrapped__(
                    state, x, jnp.float32(0.0), jnp.float32(1.0))
                return x_new
            x = jax.lax.fori_loop(0, n_steps, body, x)
            return x[0, 0] + x[0, 1]       # scalar output
        return chained

    def timed(chained, eps):
        x1 = dom.x * np.float32(1.0 + eps)
        jax.block_until_ready(x1)
        t0 = time.perf_counter()
        float(chained(state, x1))          # host readback forces the run
        return time.perf_counter() - t0

    n1, n2 = 1, 3
    c1, c2 = make_chain(n1), make_chain(n2)
    timed(c1, 1e-4)                        # compile + warm both
    timed(c2, 2e-4)
    t1 = timed(c1, 3e-4)
    t2 = timed(c2, 4e-4)
    dt = max((t2 - t1) / (n2 - n1), 1e-9)

    dofs_per_sec = dom.pattern.basicfield_size / dt
    nominal = 1e6  # ~1 s/step for a 1M-DOF implicit solve is GPU-class
    print(json.dumps({
        "metric": "newton_step_dofs_per_sec_f32_1mdof",
        "value": dofs_per_sec,
        "unit": "DOF/s",
        "vs_baseline": dofs_per_sec / nominal,
    }))


if __name__ == "__main__":
    main()
