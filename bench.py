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
(adaptive BiCGStab), the MG spectrum tuned at the converged state, and
each timed step is a full Newton re-solve to 1e-6 from a perturbed
state with Chebyshev inner solves (zero inner products).

Robustness contract (round-3 postmortem: BENCH_r03 was rc=124 with no
JSON): this script must emit its JSON line INSIDE the driver budget no
matter what.  Three mechanisms:

  1. a watchdog thread with a hard deadline (BENCH_DEADLINE_S, default
     820 s) that prints the best measurement so far — or a degraded
     record — and exits 0 even if the main thread is wedged inside a
     TPU RPC (os._exit; signal handlers can't preempt a blocked C call);
  2. budget gates between one-time phases: the expensive upgrades
     (Chebyshev spectrum tune, second step compile) only run when the
     remaining budget affords them, so a slow/cold machine still emits
     the adaptive-BiCGStab measurement at full 1e-6 tolerance;
  3. warm-start caches: the persistent JAX compilation cache
     (.jax_cache/, committed to the repo so the driver is never
     compile-cold) and a freeze cache (.freeze_cache/, populated on the
     first successful run) that skips the ~300 s of one-time freezes.

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` is reported against a fixed nominal of 1e6 assembled
DOFs/sec (~1 s/step for a 1M-DOF implicit solve is single-GPU-class).
"""

import json
import os
import sys
import threading
import time

import numpy as np

T_START = time.perf_counter()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 820))

# best-so-far measurement; the watchdog prints this if the main thread
# overruns or wedges.  Guarded by _LOCK; _DONE stops the watchdog.
_BEST = {"metric": "newton_step_dofs_per_sec_1mdof_tol1e-6",
         "value": 0.0, "unit": "DOF/s", "vs_baseline": 0.0,
         "degraded": True, "error": "no measurement completed"}
_LOCK = threading.Lock()
_DONE = threading.Event()


def _remaining():
    return DEADLINE_S - (time.perf_counter() - T_START)


def _emit(record, final=False):
    """Print the JSON line exactly once (main thread or watchdog)."""
    with _LOCK:
        if _DONE.is_set():
            return
        _DONE.set()
        print(json.dumps(record), flush=True)
    if not final:
        os._exit(0)


def _record_best(record):
    global _BEST
    with _LOCK:
        if not _DONE.is_set():
            _BEST = record


def _watchdog():
    # wake a little before the deadline so the print itself fits
    while not _DONE.wait(timeout=1.0):
        if _remaining() < 5.0:
            with _LOCK:
                best = dict(_BEST)
            best["one_time_total_s"] = round(
                time.perf_counter() - T_START, 1)
            best.setdefault("degraded", True)
            _emit(best)
            return


def _t(msg, t0, phases=None, key=None):
    dt = time.perf_counter() - t0
    print(f"[bench] {msg}: {dt:.1f}s  (remaining {_remaining():.0f}s)",
          file=sys.stderr, flush=True)
    if phases is not None:
        phases[key or msg] = round(dt, 1)
    return time.perf_counter()


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compilation cache: the step/freeze programs are
    # identical across bench runs.  The directory is COMMITTED to the
    # repo — the driver machine must not pay ~400 s of cold compiles
    # (that is what timed out round 3's run).
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
    from metafem.linsolve import krylov, twofloat as tf

    freeze_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".freeze_cache", "bench2d.pkl")

    def measure(step, x0, label, extra):
        """Compile + warm the step, run 3 timed trials from perturbed
        states, and record the result as best-so-far.

        Two timings, both honest, measuring different things:
        * single-dispatch: DIRECT per-step wall time with a host scalar
          readback — includes the remote transport's dispatch+readback
          round trip (measured ~49 ms through the axon tunnel);
        * chained (budget permitting): 6 DATA-DEPENDENT steps per
          dispatch, each consuming the previous step's solution with a
          residual-dependent re-perturbation and a dt that depends on
          the previous residual, so K_params / the frozen-tangent
          combine / the predictor are all per-iteration work — XLA can
          hoist nothing (the artifact-prone fori_loop chains of
          PERFORMANCE.md round-1 hoisted state-only work; here every
          input data-depends on the previous output).  This is the
          production transient-stepping cost: steps run back-to-back
          with no readback between them.  The headline value uses it
          when measured; single-dispatch is always reported alongside.
        """
        state = dom._runtime_state()

        def timed(eps):
            x1 = tf.DF(x0.hi * np.float32(1.0 + eps), x0.lo)
            jax.block_until_ready(x1)
            ts = time.perf_counter()
            _, _, res, it = step(state, x1, jnp.float64(0.0),
                                 jnp.float64(1.0))
            r = float(res)                 # forces the whole step
            return time.perf_counter() - ts, r, int(it)

        timed(1e-4)                        # compile + warm
        nonlocal t0
        t0 = _t(f"step compile+warm [{label}]", t0, phases,
                f"step_compile_{label}")
        results = [timed(1e-4 * (t + 2)) for t in range(3)]
        dt = float(np.median([t for t, _, _ in results]))
        n_dof = dom.pattern.basicfield_size
        nominal = 1e6
        record = {
            "metric": "newton_step_dofs_per_sec_1mdof_tol1e-6",
            "value": n_dof / dt,
            "unit": "DOF/s",
            "vs_baseline": n_dof / dt / nominal,
            "step_ms": dt * 1e3,
            "timing": "single_dispatch",
            "final_residual": results[-1][1],
            "inner_solver": label,
            "step_refines": [it for _, _, it in results],
            **extra}
        _record_best(record)

        # chained upgrade (budget gate: the 6-step chain compile is
        # minutes cold; with the committed .jax_cache it is seconds)
        if _remaining() < 260:
            print(f"[bench] budget gate: {_remaining():.0f}s left — "
                  "skipping the chained-step measurement",
                  file=sys.stderr, flush=True)
            return record
        import functools

        def step_chain(carry, st):
            x1, dt1 = carry
            x2, _, res, _ = step(st, x1, jnp.float64(0.0), dt1)
            fac = (1.0 + 1e-4
                   * (1.0 + res / (1.0 + res))).astype(jnp.float32)
            return (tf.DF(x2.hi * fac, x2.lo), 1.0 + 1e-9 * res)

        def chain(carry, st, k):
            for _ in range(k):
                carry = step_chain(carry, st)
            return carry

        try:
            c_long = jax.jit(functools.partial(chain, k=6))
            c_short = jax.jit(functools.partial(chain, k=3))

            def run(c, carry):
                ts = time.perf_counter()
                y = c(carry, state)
                float(y[0].hi.reshape(-1)[0])      # force via readback
                return time.perf_counter() - ts

            carry0 = (x0, jnp.float64(1.0))
            run(c_long, carry0)
            run(c_short, carry0)
            t0 = _t("chained-step compile+warm", t0, phases,
                    "chain_compile")
            best = np.inf
            for rep in range(2):
                x_r = tf.DF(x0.hi * np.float32(1.0 + 1e-6 * (rep + 1)),
                            x0.lo)
                jax.block_until_ready(x_r)
                tl = run(c_long, (x_r, jnp.float64(1.0)))
                tsh = run(c_short, (x_r, jnp.float64(1.0)))
                best = min(best, (tl - tsh) / 3)
            record = {**record,
                      "value": n_dof / best,
                      "vs_baseline": n_dof / best / nominal,
                      "timing": "chained_steps",
                      "chained_step_ms": best * 1e3,
                      "dispatch_overhead_ms": dt * 1e3 - best * 1e3}
            _record_best(record)
            t0 = _t(f"chained step {best*1e3:.0f} ms", t0, phases,
                    "chain_measure")
        except Exception as e:
            print(f"[bench] chained measurement failed ({e}); keeping "
                  "single-dispatch", file=sys.stderr, flush=True)
        return record

    def cheb_extra():
        cheb = getattr(dom, "_mg_cheb", None)
        return {
            "cheb_tuned": cheb is not None,
            "cheb_interval": (list(map(float, cheb[0])) if cheb else None),
            "cheb_rate": (float(cheb[1]) if cheb else None)}

    # ---- fast path: reload the production freezes + converged state ----
    loaded = False
    if os.path.exists(freeze_cache) and not os.environ.get(
            "BENCH_NO_FREEZE_CACHE"):
        try:
            import pickle
            dom.load_freezes(freeze_cache)
            with open(freeze_cache + ".x", "rb") as f:
                dom.x = jnp.asarray(pickle.load(f))
            loaded = True
            t0 = _t("load_freezes", t0, phases)
            # measure NOW; any failure (stale pytree structure the
            # layout fingerprint can't see) falls through to recompute
            sv = (krylov.chebyshev if getattr(dom, "_mg_cheb", None)
                  else krylov.bicgstab)
            step = dom.make_refined_step(sv_func=sv, maxiter=60,
                                         max_refine=10, max_pass=1)
            x0 = tf.df_from_f64(np.asarray(dom.x, np.float64))
            measure(step, x0, sv.__name__, {
                **cheb_extra(),
                "one_time_s": phases,
                "one_time_total_s": round(
                    time.perf_counter() - t_all, 1)})
            _emit(dict(_BEST), final=True)
            return
        except Exception as e:
            print(f"[bench] freeze cache unusable ({e}); recomputing",
                  file=sys.stderr, flush=True)
            loaded = False
            for name in dom._FREEZE_ATTRS:
                if hasattr(dom, name):
                    setattr(dom, name, None)
            dom.drop_host_caches()
            try:
                os.remove(freeze_cache)
                os.remove(freeze_cache + ".x")
            except OSError:
                pass

    if not loaded:
        dom.freeze_linear_tangent()
        t0 = _t("freeze_linear_tangent", t0, phases)
        # V-cycle only — the spectrum is tuned ONCE, at the converged
        # tangent (the converge-once pass uses adaptive BiCGStab, which
        # needs no enclosure); tuning here too paid the scan twice
        dom.setup_mg(tune=False)
        t0 = _t("setup_mg", t0, phases)
        dom.freeze_refined_residual()
        t0 = _t("freeze_refined_residual", t0, phases)
        # converge once (adaptive Krylov absorbs the large tangent
        # drift of the radiation boundary on the way down); production
        # stepping carries the solution as a two-float pair
        # (twofloat.py) — no full-vector emulated-f64 casts in the loop
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

        # budget gate: the Chebyshev upgrade needs the spectrum tune
        # (~60-170 s) + a second step compile (~30-60 s) + trials.  If
        # the remaining budget can't carry it, measure with the
        # adaptive-BiCGStab step we already compiled — full 1e-6
        # tolerance, just a slower inner solver.
        if _remaining() < 320:
            print(f"[bench] budget gate: {_remaining():.0f}s left — "
                  "skipping Chebyshev tune, measuring BiCGStab step",
                  file=sys.stderr, flush=True)
            measure(step_c, x_c, "bicgstab", {
                "one_time_s": phases,
                "one_time_total_s": round(
                    time.perf_counter() - t_all, 1),
                "degraded": "budget_gate_no_cheb_tune"})
            _emit(dict(_BEST), final=True)
            return
        dom.setup_mg()             # single spectrum tune, here only
        t0 = _t("tune mg at converged state", t0, phases, "tune_mg")
        # persist the freezes + converged state so later runs (and the
        # driver's next round) skip straight to the measurement
        try:
            import pickle
            os.makedirs(os.path.dirname(freeze_cache), exist_ok=True)
            dom.save_freezes(freeze_cache)
            with open(freeze_cache + ".x", "wb") as f:
                pickle.dump(np.asarray(dom.x, np.float64), f, protocol=4)
            t0 = _t("save_freezes", t0, phases)
        except Exception as e:
            print(f"[bench] save_freezes failed ({e}); continuing",
                  file=sys.stderr, flush=True)

    # Chebyshev stepping if the tuner certified a contracting enclosure;
    # adaptive BiCGStab otherwise (robustness: the bench must emit its
    # JSON line either way)
    sv = (krylov.chebyshev if getattr(dom, "_mg_cheb", None)
          else krylov.bicgstab)
    print(f"[bench] inner solver: {sv.__name__}", file=sys.stderr,
          flush=True)
    step = dom.make_refined_step(sv_func=sv, maxiter=60,
                                 max_refine=10, max_pass=1)
    x0 = tf.df_from_f64(np.asarray(dom.x, np.float64))
    measure(step, x0, sv.__name__, {
        **cheb_extra(),
        "one_time_s": phases,
        "one_time_total_s": round(time.perf_counter() - t_all, 1)})
    _emit(dict(_BEST), final=True)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:   # noqa: BLE001 — contract: always emit
        import traceback
        traceback.print_exc()
        with _LOCK:
            best = dict(_BEST)
        best["one_time_total_s"] = round(time.perf_counter() - T_START, 1)
        best.setdefault("degraded", True)
        best["error"] = f"{type(e).__name__}: {e}"
        _emit(best, final=True)
