"""Benchmark entry point (driver contract): prints ONE JSON line.

Measures the production per-step cost of the flagship config — the
reference's 2D thermal strip scaled up to ~1.28M DOF
(examples/thermal_conduction/2D_Script.jl geometry, order-2 serendipity,
nonlinear radiation boundary) — as assembled-DOFs/second of one full
implicit Newton step (update_OneStep!, solver/04_Time_Domain.jl:59-80),
converged to the reference's own 1e-6 normalized-residual bar
(pikachu.jl:106).

Production path: frozen f64 affine operator + f32 MG tangent solves
(make_refined_step) — exact residuals at hardware-rate solve cost,
cross-step caches for the static geometry (freeze_linear_tangent /
setup_mg / freeze_refined_residual), one jitted dispatch per step.
The measured step is production STEPPING: the system is converged once
(adaptive BiCGStab), the MG spectrum re-tuned at the running state, and
each timed step is a full Newton re-solve to 1e-6 from a perturbed
state with Chebyshev inner solves (zero inner products).

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` is reported against a fixed nominal of 1e6 assembled
DOFs/sec (~1 s/step for a 1M-DOF implicit solve is single-GPU-class).
"""

import json
import sys
import time

import numpy as np


def _t(msg, t0, phases=None, key=None):
    dt = time.perf_counter() - t0
    print(f"[bench] {msg}: {dt:.1f}s", file=sys.stderr, flush=True)
    if phases is not None:
        phases[key or msg] = round(dt, 1)
    return time.perf_counter()


def main():
    import os

    import jax

    # persistent compilation cache: the step/freeze programs are
    # identical across bench runs — saves the ~40 s step compile and the
    # setup jits on every run after the first (VERDICT r2 item #3)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain

    phases = {}
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    # ~1.28M DOF (BASELINE.md north star), f32 hot path on TPU
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
    t0 = _t("setup", t0, phases)

    # the reference's convergence bar (pikachu.jl:106)
    dom.converge_tol = 1e-6
    from metafem.linsolve import krylov
    # production configuration: frozen f64 affine operator (exact
    # residuals), frozen linear tangent + geometric-multigrid state
    # (static geometry), f32 MG-Krylov inner solves.  Falls back to the
    # per-step-assembled f32 path if the mesh fails lattice numbering.
    try:
        dom.freeze_linear_tangent()
        t0 = _t("freeze_linear_tangent", t0, phases)
        # V-cycle only — the spectrum is tuned ONCE, at the converged
        # tangent (the converge-once pass uses adaptive BiCGStab, which
        # needs no enclosure); tuning here too paid the scan twice
        dom.setup_mg(tune=False)
        t0 = _t("setup_mg", t0, phases)
        dom.freeze_refined_residual()
        t0 = _t("freeze_refined_residual", t0, phases)
        # production stepping carries the solution as a two-float pair
        # (twofloat.py) — no full-vector emulated-f64 casts in the loop
        from metafem.linsolve import twofloat as tf
        # converge once (adaptive Krylov absorbs the large tangent
        # drift of the radiation boundary on the way down), then re-tune
        # the MG spectrum at the converged tangent: the timed steps are
        # production stepping around the running state, with Chebyshev
        # inner solves (zero inner products, static trip count)
        step_c = dom.make_refined_step(sv_func=krylov.bicgstab,
                                       maxiter=60, max_refine=10,
                                       max_pass=1)
        state0 = dom._runtime_state()
        x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
        x_c, _, res_c, _ = step_c(state0, x_c, jnp.float64(0.0),
                                  jnp.float64(1.0))
        if not isinstance(x_c, tf.DF):     # f64 residual mode (CPU)
            x_c = tf.df_from_f64(x_c)
        jax.block_until_ready(x_c.hi)
        t0 = _t(f"converge once (res={float(res_c):.2e})", t0, phases,
                "converge_once")
        dom.x = np.asarray(tf.df_to_f64(x_c))
        dom.setup_mg()                 # single spectrum tune, here only
        t0 = _t("tune mg at converged state", t0, phases, "tune_mg")
        # Chebyshev stepping if the tuner certified a contracting
        # enclosure; adaptive BiCGStab otherwise (robustness: the bench
        # must emit its JSON line either way)
        sv = (krylov.chebyshev if getattr(dom, "_mg_cheb", None)
              else krylov.bicgstab)
        print(f"[bench] inner solver: {sv.__name__}", file=sys.stderr,
              flush=True)
        step = dom.make_refined_step(sv_func=sv, maxiter=60,
                                     max_refine=10, max_pass=1)
        inner_name = sv.__name__
        x0 = x_c
        tdtype = jnp.float64
        perturb = lambda xp, eps: tf.DF(xp.hi * np.float32(1.0 + eps),
                                        xp.lo)
    except ValueError:
        dom.converge_tol = 5e-4            # f32 floor
        step = dom.make_jitted_step(sv_func=krylov.bicgstabl, s=4,
                                    maxiter=150, max_newton=3, max_pass=1)
        inner_name = "bicgstabl_fallback"
        x0 = dom.x
        tdtype = jnp.float32
        perturb = lambda x, eps: x * np.float32(1.0 + eps)
    state = dom._runtime_state()

    # Timing: DIRECT per-step wall time with a host scalar readback and a
    # fresh (perturbed) input per trial.  Chained/hoisted timing methods
    # under-report here: XLA hoists state-only work out of a fori_loop
    # chain, which a real time-stepping loop cannot.
    def timed(eps):
        x1 = perturb(x0, eps)
        jax.block_until_ready(x1)
        t0 = time.perf_counter()
        x_new, dx, res, it = step(state, x1, tdtype(0.0), tdtype(1.0))
        r = float(res)                     # forces the whole step
        return time.perf_counter() - t0, r, int(it)

    timed(1e-4)                            # compile + warm
    t0 = _t("step compile+warm", t0, phases, "step_compile")
    results = [timed(1e-4 * (t + 2)) for t in range(3)]
    dt = float(np.median([t for t, _, _ in results]))
    res_final = results[-1][1]

    # observability (VERDICT r2 item #9): the inner-solver identity,
    # the tuner's accepted enclosure/rate, and per-step refine counts
    # are DATA, not stderr prose — a silent Chebyshev->BiCGStab
    # regression must be visible in the recorded JSON
    cheb = getattr(dom, "_mg_cheb", None)
    dofs_per_sec = dom.pattern.basicfield_size / dt
    nominal = 1e6  # ~1 s/step for a 1M-DOF implicit solve is GPU-class
    print(json.dumps({
        "metric": "newton_step_dofs_per_sec_1mdof_tol1e-6",
        "value": dofs_per_sec,
        "unit": "DOF/s",
        "vs_baseline": dofs_per_sec / nominal,
        "step_ms": dt * 1e3,
        "final_residual": res_final,
        "inner_solver": inner_name,
        "cheb_tuned": cheb is not None,
        "cheb_interval": (list(map(float, cheb[0])) if cheb else None),
        "cheb_rate": (float(cheb[1]) if cheb else None),
        "step_refines": [it for _, _, it in results],
        "one_time_s": phases,
        "one_time_total_s": round(time.perf_counter() - t_all, 1),
    }))


if __name__ == "__main__":
    main()
