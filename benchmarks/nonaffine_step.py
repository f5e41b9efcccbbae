"""At-scale df32 stepping with a VOLUME-NONAFFINE weak form (VERDICT
round-2 item #2's at-scale proof): the bench.py 1.28M-DOF thermal strip
with T-dependent conductivity k(T) = 3 + 2e-3*T — the same physics
class as hyperelasticity/convection — run through the production
refined path.

The nonaffine volume residues evaluate in two-float (double-f32)
arithmetic over frozen DF geometry tables (solver/df_lowering.py); the
affine remainder uses the frozen exact-f64 operator; tangent solves
stay f32 MG-Krylov.  Target: converge each step to the reference's
1e-6 bar at <= 2x the affine bench's step cost (BENCH_r*.json
step_ms).

Usage: python benchmarks/nonaffine_step.py [tol]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

import metafem as mf
from metafem import Bilinear
from metafem.solver.domain import FEM_Domain
from metafem.linsolve import krylov, twofloat as tf


def build(nel=(800, 400)):
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
    # k(T) = 3 + 2e-3*T: ~2x conductivity variation over 323-1173 K —
    # the volume form is genuinely nonaffine (T * grad T products)
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i))
        - 2.0e-3 * Bilinear(T.d(i), T * T.d(i))
        + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bg_fix, 1000.0 * Bilinear(T, 1173.15 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bg_top, 50.0 * Bilinear(T, 323.15 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, 323.15 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 323.15))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


def main(tol=1e-6):
    t0 = time.perf_counter()
    phases = {}

    def tick(msg, key=None):
        nonlocal t0
        dt = time.perf_counter() - t0
        print(f"[nonaffine] {msg}: {dt:.1f}s", flush=True)
        phases[key or msg] = round(dt, 1)
        t0 = time.perf_counter()

    print("backend:", jax.default_backend(), flush=True)
    dom = build()
    n = dom.pattern.basicfield_size
    print(f"n_dof = {n}", flush=True)
    tick("setup")
    dom.converge_tol = tol

    # freeze cache (brick3d_step pattern): config iteration skips the
    # ~10 min of host freezes + converge + tune
    import pickle
    fz = os.environ.get("NONAFFINE_FREEZES",
                        "/tmp/nonaffine2d_freezes.pkl")
    loaded = False
    if os.path.exists(fz):
        try:
            dom.load_freezes(fz)
            with open(fz + ".x", "rb") as f:
                dom.x = jnp.asarray(pickle.load(f))
            x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
            loaded = True
            tick(f"load_freezes({fz})", "load_freezes")
        except Exception as e:
            print(f"[nonaffine] freeze cache unusable ({e})", flush=True)

    if not loaded:
        dom.freeze_linear_tangent()
        tick("freeze_linear_tangent")
        dom.setup_mg(tune=False)
        tick("setup_mg")
        dom.freeze_refined_residual()
        assert dom._refined["wp_df"] is not None, \
            "expected DF volume tables"
        tick("freeze_refined_residual")

        # converge once with adaptive BiCGStab (nonlinear tangent
        # drifts on the way down), then tune the MG spectrum at the
        # converged tangent
        step_c = dom.make_refined_step(sv_func=krylov.bicgstab,
                                       maxiter=60,
                                       max_refine=16, max_pass=1,
                                       residual_mode="df32")
        state = dom._runtime_state()
        x_c = tf.df_from_f64(np.asarray(dom.x, np.float64))
        x_c, _, res_c, _ = step_c(state, x_c, jnp.float64(0.0),
                                  jnp.float64(1.0))
        if not isinstance(x_c, tf.DF):
            x_c = tf.df_from_f64(x_c)
        jax.block_until_ready(x_c.hi)
        tick(f"converge once (res={float(res_c):.2e})", "converge_once")

        dom.x = np.asarray(tf.df_to_f64(x_c))
        dom.setup_mg()
        tick("tune mg at converged state", "tune_mg")
        try:
            dom.save_freezes(fz)
            with open(fz + ".x", "wb") as f:
                pickle.dump(np.asarray(dom.x, np.float64), f,
                            protocol=4)
            tick("save_freezes")
        except Exception as e:
            print(f"[nonaffine] save_freezes failed ({e})", flush=True)
    cheb = getattr(dom, "_mg_cheb", None)
    sv = krylov.chebyshev if cheb else krylov.bicgstab
    print(f"[nonaffine] inner solver: {sv.__name__}", flush=True)
    state = dom._runtime_state()
    static_nl = os.environ.get("NONAFFINE_STATIC_NL", "1") == "1"
    forcing = float(os.environ.get("NONAFFINE_FORCING", "1e-2"))
    step = dom.make_refined_step(sv_func=sv, maxiter=60, max_refine=16,
                                 max_pass=1, residual_mode="df32",
                                 forcing=forcing,
                                 static_nl_tangent=static_nl)

    def timed(eps):
        x1 = tf.DF(x_c.hi * np.float32(1.0 + eps), x_c.lo)
        jax.block_until_ready(x1)
        t1 = time.perf_counter()
        _, _, res, it = step(state, x1, jnp.float64(0.0), jnp.float64(1.0))
        r = float(res)
        return time.perf_counter() - t1, r, int(it)

    timed(1e-4)
    tick("step compile+warm", "step_compile")
    results = [timed(1e-4 * (k + 2)) for k in range(3)]
    for dt, r, it in results:
        print(f"[nonaffine] warm step {dt*1e3:.0f} ms  res={r:.2e} "
              f"refines={it}", flush=True)
    dt = float(np.median([t for t, _, _ in results]))
    # per-refine differential: a tiny perturbation needs fewer refines;
    # (t(k2) - t(k1)) / (k2 - k1) isolates the per-refine cost from the
    # predictor/overhead
    t_small, r_small, it_small = timed(1e-7)
    print(f"[nonaffine] small-eps step {t_small*1e3:.0f} ms  "
          f"res={r_small:.2e} refines={it_small}", flush=True)
    it_big = results[-1][2]
    per_refine_ms = ((dt - t_small) / max(it_big - it_small, 1) * 1e3
                     if it_big != it_small else None)
    if per_refine_ms:
        print(f"[nonaffine] per-refine cost ~{per_refine_ms:.0f} ms",
              flush=True)

    # ratio vs the recorded affine bench (same mesh/DOF count)
    affine_ms = None
    for fname in ("BENCH_r05.json", "BENCH_r04.json", "BENCH_r02.json"):
        p = os.path.join(os.path.dirname(__file__), os.pardir, fname)
        if os.path.exists(p):
            try:
                rec = json.load(open(p))
                affine_ms = (rec.get("parsed") or rec).get("step_ms")
                if affine_ms:
                    break
            except Exception:
                pass
    record = {"metric": "nonaffine_volume_df32_step_tol1e-6",
              "n_dof": n, "step_ms": dt * 1e3,
              "static_nl_tangent": static_nl, "forcing": forcing,
              "per_refine_ms": per_refine_ms,
              "small_eps_step_ms": t_small * 1e3,
              "small_eps_refines": it_small,
              "dofs_per_sec": n / dt,
              "residual": results[-1][1],
              "inner_solver": sv.__name__,
              "cheb_interval": (list(map(float, cheb[0])) if cheb
                                else None),
              "cheb_rate": (float(cheb[1]) if cheb else None),
              "step_refines": [it for _, _, it in results],
              "affine_bench_step_ms": affine_ms,
              "vs_affine": (dt * 1e3 / affine_ms if affine_ms else None),
              "one_time_s": phases}
    print(json.dumps(record))
    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "BENCH_nonaffine.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main(tol=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6)
