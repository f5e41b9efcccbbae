"""3D production stepping at ~1.44M DOF (56^3 brick, order-2
serendipity): the same frozen-cache refined path bench.py times in 2D —
frozen f64 affine operator + frozen per-td linear tangent + frozen MG +
Chebyshev inner solves — measured as single warm steps with fresh
perturbed inputs and a host scalar readback.

Target (VERDICT round 1, item 2): < 1.5 s/step at 1e-6 tolerance.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(nel_side=56, tol=1e-6, forcing=1e-2, nu1=2, nu2=2):
    import os

    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov, multigrid, twofloat as tf

    t0 = time.perf_counter()

    def tick(msg):
        nonlocal t0
        print(f"[brick3d] {msg}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()

    nel = (nel_side,) * 3
    L = 1.0
    vert, conn = mf.make_brick((L, L, L), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    bottom = mf.select_facets(geo, lambda c: c[:, 2] < eps)
    top = mf.select_facets(geo, lambda c: c[:, 2] > L - eps)
    bg_b = dom.add_boundary(wp, bottom)
    bg_t = dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    # radiation on top keeps a nonlinear boundary in the loop (same
    # structure as the 2D bench)
    dom.assign_boundary_weakform(wp, bg_b, 1000.0 * Bilinear(T, 800.0 - T))
    dom.assign_boundary_weakform(
        wp, bg_t, 50.0 * Bilinear(T, 300.0 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, 300.0 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=3, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.set_field(wp, "s", np.full(mesh.n_cp, 100.0))
    dom.refresh_fields()
    dom.assemble_x()
    n = dom.pattern.basicfield_size
    print(f"n_dof = {n}", flush=True)
    tick("setup")

    dom.converge_tol = tol
    # freeze cache (pikachu_scale pattern): config sweeps skip the
    # ~10 min of host freezes + tune; nu enters the cache name (the MG
    # state depends on it)
    import pickle
    fz = f"/tmp/brick3d_freezes_{nel_side}_{nu1}{nu2}.pkl"
    loaded = False
    if os.path.exists(fz):
        try:
            dom.load_freezes(fz)
            with open(fz + ".x", "rb") as f:
                dom.x = jnp.asarray(pickle.load(f))
            x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
            loaded = True
            tick(f"load_freezes({fz})")
        except Exception as e:
            print(f"[brick3d] freeze cache unusable ({e})", flush=True)
    if not loaded:
        dom.freeze_linear_tangent()
        tick("freeze_linear_tangent")
        # V-cycle only here; the spectrum is tuned ONCE, at the
        # converged tangent (bench.py flow)
        dom.setup_mg(tune=False, nu1=nu1, nu2=nu2)
        tick("setup_mg")
        dom.freeze_refined_residual()
        tick("freeze_refined_residual")

        step_c = dom.make_refined_step(sv_func=krylov.bicgstab,
                                       maxiter=60, max_refine=10,
                                       max_pass=1)
        state = dom._runtime_state()
        x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
        x_c, _, res_c, _ = step_c(state, x_c, jnp.float64(0.0),
                                  jnp.float64(1.0))
        if not isinstance(x_c, tf.DF):
            x_c = tf.df_from_f64(x_c)
        jax.block_until_ready(x_c.hi)
        tick(f"converge once (res={float(res_c):.2e})")

        dom.x = np.asarray(tf.df_to_f64(x_c))
        dom.setup_mg(nu1=nu1, nu2=nu2)
        tick("tune mg at converged state")
        try:
            dom.save_freezes(fz)
            with open(fz + ".x", "wb") as f:
                pickle.dump(np.asarray(dom.x, np.float64), f, protocol=4)
            tick("save_freezes")
        except Exception as e:
            print(f"[brick3d] save_freezes failed ({e})", flush=True)
    cheb = getattr(dom, "_mg_cheb", None)
    sv = krylov.chebyshev if cheb else krylov.bicgstab
    print(f"[brick3d] inner solver: {sv.__name__}", flush=True)
    state = dom._runtime_state()
    static_nl = os.environ.get("METAFEM_3D_STATIC_NL", "1") == "1"
    step = dom.make_refined_step(sv_func=sv, maxiter=60, max_refine=10,
                                 max_pass=1, forcing=forcing,
                                 static_nl_tangent=static_nl)

    def timed(eps):
        x1 = tf.DF(x_c.hi * np.float32(1.0 + eps), x_c.lo)
        jax.block_until_ready(x1)
        t1 = time.perf_counter()
        _, _, res, it = step(state, x1, jnp.float64(0.0), jnp.float64(1.0))
        r = float(res)
        return time.perf_counter() - t1, r, int(it)

    timed(1e-4)
    tick("step compile+warm")
    results = [timed(1e-4 * (t + 2)) for t in range(3)]
    for dt, r, it in results:
        print(f"[brick3d] warm step {dt*1e3:.0f} ms  res={r:.2e} "
              f"refines={it}", flush=True)
    dt = float(np.median([t for t, _, _ in results]))

    # chained data-dependent steps: the device step without the remote
    # transport's dispatch+readback round trip (~115 ms at this size —
    # see step_phases.py / PERFORMANCE.md round-5 2D table)
    import functools

    def step_chain(carry, st):
        x1, dt1 = carry
        x2, _, res, _ = step(st, x1, jnp.float64(0.0), dt1)
        fac = (1.0 + 1e-4 * (1.0 + res / (1.0 + res))).astype(
            jnp.float32)
        return (tf.DF(x2.hi * fac, x2.lo), 1.0 + 1e-9 * res)

    def chain(carry, st, k):
        for _ in range(k):
            carry = step_chain(carry, st)
        return carry

    chained_ms = None
    try:
        c_long = jax.jit(functools.partial(chain, k=6))
        c_short = jax.jit(functools.partial(chain, k=3))

        def run(c, carry):
            t1 = time.perf_counter()
            y = c(carry, state)
            float(y[0].hi.reshape(-1)[0])
            return time.perf_counter() - t1

        run(c_long, (x_c, jnp.float64(1.0)))
        run(c_short, (x_c, jnp.float64(1.0)))
        tick("chain compile+warm")
        best = np.inf
        for rep in range(2):
            x_r = tf.DF(x_c.hi * np.float32(1.0 + 1e-6 * (rep + 1)),
                        x_c.lo)
            jax.block_until_ready(x_r)
            best = min(best, (run(c_long, (x_r, jnp.float64(1.0)))
                              - run(c_short, (x_r, jnp.float64(1.0))))
                       / 3)
        chained_ms = best * 1e3
        tick(f"chained step {chained_ms:.0f} ms")
    except Exception as e:
        print(f"[brick3d] chained measurement failed: {e}", flush=True)

    record = {"metric": "brick3d_newton_step_tol1e-6",
              "n_dof": n, "step_ms": dt * 1e3,
              "chained_step_ms": chained_ms,
              "dofs_per_sec": n / dt,
              "dofs_per_sec_device": (n / (chained_ms / 1e3)
                                      if chained_ms else None),
              "residual": results[-1][1],
              "inner_solver": sv.__name__,
              "cheb_interval": (list(map(float, cheb[0])) if cheb
                                else None),
              "cheb_rate": (float(cheb[1]) if cheb else None),
              "forcing": forcing, "nu": [nu1, nu2],
              "static_nl_tangent": static_nl,
              "step_refines": [it for _, _, it in results],
              "mg_shapes": [list(s) for s in
                            multigrid.hierarchy_for_domain(dom).shapes]}
    record["measured"] = time.strftime("%Y-%m-%d")
    print(json.dumps(record))
    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "BENCH_brick3d.json")
    try:   # keep the recorded config sweep from earlier runs
        with open(out) as f:
            prev = json.load(f)
        if "sweep" in prev:
            record["sweep"] = prev["sweep"]
    except (OSError, ValueError):
        pass
    with open(out, "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    import os
    main(nel_side=int(sys.argv[1]) if len(sys.argv) > 1 else 56,
         tol=float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6,
         forcing=float(sys.argv[3]) if len(sys.argv) > 3 else 1e-2,
         nu1=int(sys.argv[4]) if len(sys.argv) > 4 else 2,
         nu2=int(sys.argv[5]) if len(sys.argv) > 5 else 2)
