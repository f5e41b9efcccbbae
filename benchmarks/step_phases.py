"""Warm-step phase breakdown (the MFU story): decompose the production
refined step at ~1.28M DOF into its device phases, each timed honestly
(data-dependent chains, perturbed inputs, scalar readbacks), and roll
them up against the measured full step and the HBM roofline.

BASELINE.md promises assembly & SpMV kernels >= 70% of roofline; this
probe shows what fraction of the *step* is roofline-bound traffic and
where the rest goes:

    phase           per-call   calls/step   total   % step   roofline%
    A.mv (fine SpMV)   ...        ...         ...     ...       ...
    V-cycle            ...
    df residual        ...
    nl_grad assembly   ...
    chebyshev solve    ...
    (reconciliation: sum of phases vs measured step)

Usage: python benchmarks/step_phases.py [2d|3d]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

HBM_GBPS = 819.0        # TPU v5e chip HBM bandwidth


def build_2d(nel=(800, 400)):
    import jax.numpy as jnp
    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
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
    return dom


def build_3d(nel_side=56):
    import jax.numpy as jnp
    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
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
    return dom


from _timing import chain_time  # noqa: E402  (shared timing helper)


def main(which="2d", size=0):
    import os

    import jax

    # persistent compilation cache (same as bench.py): without it every
    # freeze/setup program cold-compiles through the remote transport —
    # measured as a silent multi-minute stall with ~0 host CPU
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    from metafem.linsolve import krylov, multigrid, twofloat as tf
    from metafem.linsolve.block_offset import OffsetMatrix

    t0 = time.perf_counter()

    def tick(msg):
        nonlocal t0
        print(f"[phases] {msg}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()

    if which == "2d":
        dom = build_2d((size, size // 2) if size else (800, 400))
    else:
        dom = build_3d(size or 56)
    n = dom.pattern.basicfield_size
    layout = dom.pattern.offset_layout
    L = dom.pattern.max_time_level
    print(f"n_dof = {n}  n_storage = {layout.n_storage}", flush=True)
    tick("setup")

    dom.converge_tol = 1e-6
    # reuse bench.py's freeze cache when probing the bench config (same
    # domain, same converged state) — skips ~10 min of freezes + tune
    import os
    fz = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      os.pardir, ".freeze_cache", "bench2d.pkl")
    loaded = False
    if which == "2d" and not size and os.path.exists(fz):
        try:
            import pickle
            dom.load_freezes(fz)
            with open(fz + ".x", "rb") as f:
                dom.x = jnp.asarray(pickle.load(f))
            x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
            loaded = True
            tick("load_freezes (bench cache)")
        except Exception as e:
            print(f"[phases] freeze cache unusable ({e}); recomputing",
                  flush=True)
    if not loaded:
        dom.freeze_linear_tangent()
        dom.setup_mg(tune=False)
        dom.freeze_refined_residual()
        tick("freezes")

        # converge once, then tune at the converged tangent (bench.py
        # flow)
        step_c = dom.make_refined_step(sv_func=krylov.bicgstab,
                                       maxiter=60, max_refine=10,
                                       max_pass=1)
        state = dom._runtime_state()
        x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
        x_c, _, res_c, _ = step_c(state, x_c, jnp.float64(0.0),
                                  jnp.float64(1.0))
        if not isinstance(x_c, tf.DF):     # f64 residual mode (CPU)
            x_c = tf.df_from_f64(x_c)
        jax.block_until_ready(x_c.hi)
        tick(f"converge once (res={float(res_c):.2e})")
        dom.x = np.asarray(tf.df_to_f64(x_c))
        dom.setup_mg()
        tick("tune mg")
    cheb = getattr(dom, "_mg_cheb", None)
    assert cheb is not None, "tuner rejected — phase model assumes Chebyshev"
    interval, rate = cheb
    forcing = 1e-2
    n_cheb = int(np.clip(np.ceil(np.log(forcing / 2.0) / np.log(rate)),
                         2, 60))
    state = dom._runtime_state()

    # ---- the measured full step --------------------------------------
    step = dom.make_refined_step(sv_func=krylov.chebyshev, maxiter=60,
                                 max_refine=10, max_pass=1)

    def timed_step(eps):
        x1 = tf.DF(x_c.hi * np.float32(1.0 + eps), x_c.lo)
        jax.block_until_ready(x1)
        t1 = time.perf_counter()
        _, _, res, it = step(state, x1, jnp.float64(0.0), jnp.float64(1.0))
        r = float(res)
        return time.perf_counter() - t1, r, int(it)

    timed_step(1e-4)
    tick("step compile+warm")
    step_res = [timed_step(1e-4 * (k + 2)) for k in range(3)]
    step_ms = float(np.median([t for t, _, _ in step_res])) * 1e3
    refines = int(np.median([it for _, _, it in step_res]))
    tick(f"full step: {step_ms:.0f} ms, {refines} refines")

    # ---- chained steps: device time WITHOUT the dispatch round trip ----
    # Production transient stepping runs steps back-to-back with no host
    # readback between them; chaining data-dependent steps (each step
    # consumes the previous x, re-perturbed so every step re-converges
    # from ~the same distance) in ONE dispatch measures the pure device
    # step.  single-dispatch minus chained = transport/dispatch latency
    # (a per-READBACK cost, not a per-step cost).  Hoisting cannot fake
    # this: every step's input depends on the previous step's output.
    def step_chain(carry, st):
        x1, dt1 = carry
        # dt data-depends on the previous step -> K_params, the frozen-
        # tangent combine, and the predictor are all per-iteration work
        # (nothing state-only for XLA to hoist out of the chain).  The
        # state rides consts: closed-over state arrays bake into the
        # 6x-inlined chain as HLO constants and overflow the remote
        # compile transport (HTTP 413).
        x2, _, res, _ = step(st, x1, jnp.float64(0.0), dt1)
        fac = (1.0 + 1e-4
               * (1.0 + res / (1.0 + res))).astype(jnp.float32)
        dt2 = 1.0 + 1e-9 * res
        return (tf.DF(x2.hi * fac, x2.lo), dt2)

    chain_sec = chain_time(step_chain, (x_c, jnp.float64(1.0)), n=6,
                           consts=state)
    chain_ms = chain_sec * 1e3
    tick(f"chained step: {chain_ms:.0f} ms/step "
         f"(dispatch+readback overhead {step_ms - chain_ms:.0f} ms)")

    # ---- phase primitives ---------------------------------------------
    # tangent at the converged state, built the way the production step
    # builds it: frozen per-td linear components + the boundary-only
    # nonaffine gradient blocks.  (NOT dom._k_linear/_res_k — the volume
    # maps those need are never shipped on the refined path, and baking
    # them as HLO constants overflows the remote-compile transport.)
    ga = dom.time_discretization
    gamma, alpha = ga.gamma_params, ga.alpha_params
    beta = 1.0 / np.array([np.prod(gamma[:i]) for i in range(L + 1)])
    K_params = jnp.asarray(np.asarray(alpha[:L + 1]) * beta, jnp.float32)
    K_td = state["K_linear_td"]
    K_lin = K_params[0] * K_td[0]
    for td in range(1, L + 1):
        K_lin = K_lin + K_params[td] * K_td[td]
    if state.get("ghost_diag") is not None:
        K_lin = K_lin + state["ghost_diag"]
    dom._ensure_device_maps("nl_grad")
    state = dom._runtime_state()
    xs_conv = jnp.broadcast_to(jnp.asarray(dom.x, dom.dtype), (L + 1, n))
    _, K_nl = dom._run_phase({**state, "x_star": xs_conv,
                              "K_params": K_params}, "nl_grad")
    K_total = K_lin + K_nl
    A = OffsetMatrix.from_values(K_total.astype(dom.dtype), layout)
    hier = multigrid.hierarchy_for_domain(dom)
    mg_state = state["mg_frozen"]
    op = multigrid.MGOperator(A, mg_state, hier)

    v0 = jnp.asarray(np.random.default_rng(3).standard_normal(n),
                     dom.dtype)

    def norm1(f):
        return lambda x, c: (lambda y: y / jnp.linalg.norm(y))(f(x, c))

    phases = {}
    # n=40: the 0.04-0.1 ms A.mv differential at n=20 sits below the
    # chain noise floor (the round-4 table published a negative entry)
    phases["A.mv"] = chain_time(norm1(lambda x, A_: A_.mv(x)), v0,
                                n=40, consts=A)
    tick("A.mv chain")
    phases["vcycle"] = chain_time(
        norm1(lambda x, ms: multigrid.vcycle(hier, ms, x)), v0,
        consts=mg_state)
    tick("vcycle chain")

    # one Chebyshev inner solve at the tuned trip count (as in the step)
    def cheb_solve(b, c):
        A_, ms = c
        op_ = multigrid.MGOperator(A_, ms, hier)
        y, _, _ = krylov.chebyshev(op_, b, maxiter=n_cheb,
                                   interval=interval)
        return y

    phases[f"cheb_solve({n_cheb})"] = chain_time(
        norm1(cheb_solve), v0, n=6, consts=(A, mg_state))
    tick("chebyshev chain")

    # df32 exact residual: r = b + sum_td A_td x_td (two-float SpMVs)
    ref = state["refined"]
    coo_dev = (state.get("coo_rows"), state.get("coo_cols"))

    def df_residual(xhi, c):
        ref_, (rows, cols) = c
        xdf = tf.DF(xhi, jnp.zeros_like(xhi))
        r = tf.DF(ref_["b_hi"], ref_["b_lo"])
        for td in range(L + 1):
            r = tf.df_add(r, tf.df_offset_mv(
                tf.DF(ref_["A_hi"][td], ref_["A_lo"][td]), layout, xdf,
                coo_rows=rows, coo_cols=cols))
        return r.hi / jnp.linalg.norm(r.hi)

    phases["df_residual"] = chain_time(df_residual, v0,
                                       consts=(ref, coo_dev))
    tick("df residual chain")

    # nonaffine tangent blocks (boundary assembly, f32)
    dom._ensure_device_maps("nl_grad")
    run_phase = dom._run_phase

    def nl_grad(xs, st_):
        # x_star carries the time-level axis [L+1, n] (what the
        # production step's residual_and_knl passes as xs.hi)
        st2 = {**st_, "x_star": jnp.broadcast_to(xs, (L + 1, n)),
               "K_params": jnp.ones(L + 1, jnp.float32)}
        _, K_nl = run_phase(st2, "nl_grad")
        # data dependence via a cheap reduction folded into the carry
        return xs * (1.0 + 0.0 * jnp.sum(K_nl))

    try:
        phases["nl_grad"] = chain_time(nl_grad, v0, n=10, consts=state)
    except Exception as e:          # keep the table on a probe failure
        print(f"[phases] nl_grad probe failed: {e}", flush=True)
        phases["nl_grad"] = 0.0
    tick("nl_grad chain")

    # df solution-carry arithmetic: per refine the step runs the
    # predictor/xs construction (df_scale + df_add), the dx update
    # (df_add_f32) and the final x+dx — ~6 full-vector two-float passes
    # this probe chains in one representative sequence
    def df_carry(xhi, _c):
        xp = tf.DF(jnp.broadcast_to(xhi, (L + 1, n)),
                   jnp.zeros((L + 1, n), xhi.dtype))
        al = jnp.ones((L + 1, 1), jnp.float32)
        xs = tf.df_add(xp, tf.df_scale(xp, al))          # xs = x + a*dx
        dx2 = tf.df_add_f32(xp, 0.5 * xs.hi)             # dx update
        xn = tf.df_add(xp, dx2)                          # x + dx
        y = xn.hi[0]
        return y / jnp.linalg.norm(y)

    phases["df_carry"] = chain_time(df_carry, v0, n=10, consts=())
    tick("df_carry chain")

    # per-refine tangent combine: K = sum_td K_params[td] * K_td + ghost
    # (reads the whole [L+1, n_storage] stack — pure HBM traffic)
    def k_combine(xs, c):
        K_td_, ghost_ = c
        K = xs[0] * K_td_[0]
        for td in range(1, L + 1):
            K = K + K_td_[td]
        if ghost_ is not None:
            K = K + ghost_
        return xs * (1.0 + 0.0 * jnp.sum(K))

    phases["k_combine"] = chain_time(
        k_combine, v0, n=10,
        consts=(state["K_linear_td"], state.get("ghost_diag")))
    tick("k_combine chain")

    # ---- roofline model -----------------------------------------------
    fbytes = 4
    mv_bytes = (layout.n_storage + 2 * n) * fbytes
    # V-cycle: 4 fine operator applies (init + nu1-1 + residual + nu2)
    # + coarse levels at (1/2^dim) each with the probed stencil
    n_off = len(hier.offsets)
    C = hier.channels
    lvl_bytes = [mv_bytes]
    for shp in hier.shapes[1:]:
        pts = int(np.prod(shp))
        lvl_bytes.append((n_off * C * C * pts + 2 * C * pts) * fbytes)
    vc_bytes = 4 * sum(lvl_bytes[:-1]) + 2 * lvl_bytes[-1]
    df_bytes = (L + 1) * 2 * (layout.n_storage + 2 * n) * fbytes
    kc_bytes = (L + 2) * layout.n_storage * fbytes
    model = {"A.mv": mv_bytes, "vcycle": vc_bytes,
             f"cheb_solve({n_cheb})": n_cheb * (vc_bytes + mv_bytes),
             "df_residual": df_bytes, "k_combine": kc_bytes}

    # ---- roll-up -------------------------------------------------------
    # per warm step: refines x (cheb_solve + apply_m vcycle + A.mv)
    #              + (refines + 1) x (df_residual + nl_grad + norm)
    calls = {"A.mv": refines, "vcycle": refines,
             f"cheb_solve({n_cheb})": refines,
             "df_residual": refines + 1, "nl_grad": refines + 1,
             "df_carry": refines + 1, "k_combine": refines}
    # reconcile against the CHAINED (device-only) step: the dispatch/
    # readback round trip is a per-readback transport cost, not device
    # work — it gets its own line instead of polluting "unaccounted"
    print(f"\n== warm step {step_ms:.1f} ms single-dispatch / "
          f"{chain_ms:.1f} ms chained, {refines} refines, "
          f"cheb trip {n_cheb}, rate {rate:.2f} ==")
    print(f"{'phase':>18} {'ms/call':>9} {'calls':>6} {'ms/step':>9} "
          f"{'%step':>6} {'roofline%':>9}")
    total = 0.0
    out_phases = {}
    for k, sec in phases.items():
        ms = sec * 1e3
        c = calls.get(k, 0)
        tot = ms * c
        total += tot
        roof = ""
        rf = None
        if k in model:
            rf = model[k] / sec / 1e9 / HBM_GBPS * 100
            roof = f"{rf:8.0f}%"
        print(f"{k:>18} {ms:9.3f} {c:6d} {tot:9.1f} "
              f"{tot / chain_ms * 100:5.1f}% {roof:>9}")
        out_phases[k] = {"ms_per_call": round(ms, 3), "calls": c,
                         "roofline_pct": (round(rf, 1) if rf else None)}
    print(f"{'sum of phases':>18} {'':9} {'':6} {total:9.1f} "
          f"{total / chain_ms * 100:5.1f}%")
    print(f"{'unaccounted':>18} {'':9} {'':6} {chain_ms - total:9.1f} "
          f"{(chain_ms - total) / chain_ms * 100:5.1f}%  (of chained)")
    print(f"{'dispatch+readback':>18} {'':9} {'':6} "
          f"{step_ms - chain_ms:9.1f}   (single-dispatch only)")

    print(json.dumps({"which": which, "n_dof": n, "step_ms": step_ms,
                      "chained_step_ms": round(chain_ms, 1),
                      "dispatch_overhead_ms": round(step_ms - chain_ms, 1),
                      "refines": refines, "n_cheb": n_cheb,
                      "cheb_rate": float(rate),
                      "phases": out_phases,
                      "sum_ms": round(total, 1),
                      "unaccounted_ms": round(step_ms - total, 1)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "2d",
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
