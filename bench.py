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

    state = dom._runtime_state()
    state["x_star"] = dom.x

    # data-dependent chain: each assembly consumes the previous result, so
    # async dispatch / any transport-level caching cannot fake the timing
    n_iters = 20

    @jax.jit
    def chained(state):
        def body(i, xs):
            st = dict(state)
            st["x_star"] = xs
            residue, K_total = dom._res_k.__wrapped__(st)
            return xs + 1e-12 * residue[None, :]
        return jax.lax.fori_loop(0, n_iters, body, state["x_star"])

    jax.block_until_ready(chained(state))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(chained(state))
    dt = (time.perf_counter() - t0) / n_iters

    dofs_per_sec = dom.pattern.basicfield_size / dt
    nominal = 1e7
    print(json.dumps({
        "metric": "assemble_dofs_per_sec_f32_1mdof",
        "value": dofs_per_sec,
        "unit": "DOF/s",
        "vs_baseline": dofs_per_sec / nominal,
    }))


if __name__ == "__main__":
    main()
