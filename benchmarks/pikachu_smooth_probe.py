"""TPU experiment: aux-MG smoothing variants on the pikachu mesh.

The unstructured step cost is ~linear in the number of gather-bound fine
SpMVs: with smooth='full' every preconditioned operator apply costs
nu1+nu2+2 of them; with smooth='sparse' (SparseSmoothOp) only the outer
A∘M product does.  This probe measures, per config, the converge-from-
cold and warm-step wall times + refine counts at the production
tolerance, on the real TPU, at a configurable refine level.

Usage:
  python benchmarks/pikachu_smooth_probe.py [refine] [cfg ...]
  cfg = smooth-nu1-nu2[-forcing[-maxiter]]   e.g. full-2-2  sparse-1-1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

import pikachu_3d
from metafem.linsolve import krylov, twofloat as tf

TOL = 1e-6


def run_config(dom, cfg, x_init):
    parts = cfg.split("-")
    smooth, nu1, nu2 = parts[0], int(parts[1]), int(parts[2])
    forcing = float(parts[3]) if len(parts) > 3 else 0.3
    maxiter = int(parts[4]) if len(parts) > 4 else 12
    inner = "exact"
    if smooth == "sparsein":          # fully tail-free inner solve
        smooth, inner = "sparse", "sparse"
    t0 = time.perf_counter()
    dom.setup_auxmg(smooth=smooth, nu1=nu1, nu2=nu2, verbose=True)
    print(f"[{cfg}] setup_auxmg: {time.perf_counter()-t0:.1f}s",
          flush=True)
    step = dom.make_refined_step(sv_func=krylov.bicgstab,
                                 precond="auxmg", maxiter=maxiter,
                                 max_refine=1, max_pass=1,
                                 forcing=forcing, inner_operator=inner)
    state = dom._runtime_state()

    def converge(x1, label, max_refine=40):
        t1 = time.perf_counter()
        r_prev = np.inf
        for k in range(max_refine):
            x1, _, res, _ = step(state, x1, jnp.float64(0.0),
                                 jnp.float64(1.0))
            r = float(res)
            print(f"[{cfg}]   {label} refine {k}: res={r:.2e} "
                  f"({time.perf_counter()-t1:.2f}s)", flush=True)
            if r < TOL or r >= 0.85 * r_prev:
                break
            r_prev = r
        return time.perf_counter() - t1, r, k + 1, x1

    dt_cold, r, it, x_new = converge(x_init, "cold")
    print(f"[{cfg}] cold: {dt_cold:.2f}s res={r:.2e} refines={it}",
          flush=True)
    times = []
    for k in range(2):
        x1 = tf.DF(x_new.hi * np.float32(1.0 + 1e-4 * (k + 1)), x_new.lo)
        jax.block_until_ready(x1)
        dt, r, it, x_new = converge(x1, f"warm{k}")
        times.append(dt)
    print(f"[{cfg}] RESULT cold={dt_cold:.2f}s "
          f"warm={np.median(times)*1e3:.0f}ms res={r:.2e}", flush=True)
    return np.median(times)


def main(refine=1, configs=("full-2-2", "sparse-2-2", "sparse-1-1")):
    t0 = time.perf_counter()
    print("backend:", jax.default_backend(), flush=True)
    dom, geo, mesh = pikachu_3d.build(itp_order=2, itg_order=5,
                                      refine=refine, dtype=jnp.float32)
    n = dom.pattern.basicfield_size
    print(f"n_cp = {mesh.n_cp}  n_dof = {n}  "
          f"build {time.perf_counter()-t0:.1f}s", flush=True)
    dom.converge_tol = TOL

    fz = f"/tmp/pikachu_freezes_pre_auxmg_r{refine}.pkl"
    loaded = False
    if os.path.exists(fz):
        try:
            dom.load_freezes(fz)
            loaded = True
            print(f"loaded freezes {fz}", flush=True)
        except ValueError as e:
            print(e, flush=True)
    if not loaded:
        t1 = time.perf_counter()
        dom.freeze_linear_tangent()
        dom.freeze_refined_residual()
        print(f"freezes: {time.perf_counter()-t1:.1f}s", flush=True)
        dom.save_freezes(fz)
    dom.free_volume_tables()

    x0 = tf.df_from_f64(np.asarray(dom.x, np.float64))
    results = {}
    for cfg in configs:
        results[cfg] = run_config(dom, cfg, x0)
    print({k: f"{v*1e3:.0f}ms" for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    refine = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfgs = sys.argv[2:] or ("full-2-2", "sparse-2-2", "sparse-1-1")
    main(refine, cfgs)
