"""3D production stepping sweep at ~1.44M DOF: pay the one-time setup
(freezes + MG probe + spectrum tune) ONCE, then time warm steps for
several inexact-Newton forcing values and smoother weights.

The round-2 verdict's 3D target is <= 1.0 s/step at 1e-6 (item #4);
the 1.53 s round-2 measurement used forcing=1e-2 (11 Chebyshev iters
per refine at rate 0.6, 2 refines/step).  Total inner work is
refines x n_cheb x (SpMV + V-cycle); a looser forcing trades more
refines for far fewer inner iterations, and nu=(1,1) halves the
smoother SpMVs per V-cycle at a slightly worse contraction rate —
this sweep measures the actual optimum instead of guessing.

Writes the best config to BENCH_brick3d.json (ADVICE r2: the 3D
headline number must be a machine-readable committed artifact).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FORCINGS = (1e-2, 0.05, 0.15, 0.3)


def main(nel_side=56, tol=1e-6, nu_configs=((2, 2), (1, 1))):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov, multigrid, twofloat as tf

    t0 = time.perf_counter()

    def tick(msg):
        nonlocal t0
        print(f"[sweep] {msg}: {time.perf_counter() - t0:.1f}s",
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
    dom.freeze_linear_tangent()
    tick("freeze_linear_tangent")
    dom.setup_mg(tune=False)
    tick("setup_mg (untuned)")
    dom.freeze_refined_residual()
    tick("freeze_refined_residual")

    step_c = dom.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                   max_refine=10, max_pass=1)
    state = dom._runtime_state()
    x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
    x_c, _, res_c, _ = step_c(state, x_c, jnp.float64(0.0),
                              jnp.float64(1.0))
    if not isinstance(x_c, tf.DF):
        x_c = tf.df_from_f64(x_c)
    jax.block_until_ready(x_c.hi)
    tick(f"converge once (res={float(res_c):.2e})")
    dom.x = np.asarray(tf.df_to_f64(x_c))

    def timed(step, state, eps):
        x1 = tf.DF(x_c.hi * np.float32(1.0 + eps), x_c.lo)
        jax.block_until_ready(x1)
        t1 = time.perf_counter()
        _, _, res, it = step(state, x1, jnp.float64(0.0), jnp.float64(1.0))
        r = float(res)
        return time.perf_counter() - t1, r, int(it)

    records = []
    for nu1, nu2 in nu_configs:
        dom.setup_mg(nu1=nu1, nu2=nu2)
        tick(f"setup_mg+tune nu=({nu1},{nu2})")
        cheb = getattr(dom, "_mg_cheb", None)
        if cheb is None:
            print(f"[sweep] nu=({nu1},{nu2}): tuner rejected — skip",
                  flush=True)
            continue
        state = dom._runtime_state()
        for forcing in FORCINGS:
            step = dom.make_refined_step(sv_func=krylov.chebyshev,
                                         maxiter=60, max_refine=10,
                                         max_pass=1, forcing=forcing)
            timed(step, state, 1e-4)          # compile + warm
            tick(f"compile nu=({nu1},{nu2}) forcing={forcing}")
            results = [timed(step, state, 1e-4 * (t + 2))
                       for t in range(3)]
            dt = float(np.median([t for t, _, _ in results]))
            ok = all(r <= tol * 1.05 for _, r, _ in results)
            rec = {"nu": [nu1, nu2], "forcing": forcing,
                   "step_ms": dt * 1e3,
                   "residuals": [r for _, r, _ in results],
                   "refines": [it for _, _, it in results],
                   "cheb_interval": list(map(float, cheb[0])),
                   "cheb_rate": float(cheb[1]),
                   "converged": ok}
            print(f"[sweep] {rec}", flush=True)
            records.append(rec)

    good = [r for r in records if r["converged"]]
    best = min(good or records, key=lambda r: r["step_ms"])
    out = {"metric": "brick3d_newton_step_tol1e-6",
           "n_dof": n,
           "step_ms": best["step_ms"],
           "dofs_per_sec": n / (best["step_ms"] * 1e-3),
           "residual": best["residuals"][-1],
           "inner_solver": "chebyshev",
           "cheb_interval": best["cheb_interval"],
           "cheb_rate": best["cheb_rate"],
           "forcing": best["forcing"], "nu": best["nu"],
           "step_refines": best["refines"],
           "mg_shapes": [list(s) for s in
                         multigrid.hierarchy_for_domain(dom).shapes],
           "sweep": records}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "BENCH_brick3d.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[sweep] wrote {os.path.abspath(path)}", flush=True)


if __name__ == "__main__":
    main(nel_side=int(sys.argv[1]) if len(sys.argv) > 1 else 56,
         tol=float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6)
