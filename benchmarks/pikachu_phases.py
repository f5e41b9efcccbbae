"""Phase decomposition of the pikachu unstructured refined step — the
step_phases.py counterpart for the aux-space MG path.  Times, with
differential data-dependent chains (benchmarks/_timing.py):

    A.mv           full fine SpMV (dense segments + BSR tail)
    dense.mv       dense segments only (tailless view)
    As.mv          sparsified smoother (dense + block-diag + lump)
    Pt / P         cloud->lattice / lattice->cloud transfers
    lat_vcycle     the aux-lattice V-cycle below the transfers
    apply_m        the whole aux preconditioner apply
    op.mv          A ∘ M (one preconditioned operator product)
    df_residual    frozen A_td two-float SpMV (the exact residual)

then rolls them up against the measured per-refine dispatch.

Usage: python benchmarks/pikachu_phases.py [refine] [smooth]
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
from _timing import chain_time
from metafem.linsolve import auxmg, krylov, multigrid, twofloat as tf
from metafem.linsolve.block_offset import OffsetMatrix


def main(refine=1, smooth="full"):
    t0 = time.perf_counter()

    def tick(msg):
        nonlocal t0
        print(f"[pph] {msg}: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()

    print("backend:", jax.default_backend(), flush=True)
    dom, geo, mesh = pikachu_3d.build(itp_order=2, itg_order=5,
                                      refine=refine, dtype=jnp.float32)
    n = dom.pattern.basicfield_size
    layout = dom.pattern.offset_layout
    print(f"n_dof = {n} n_dense = {layout.n_dense} "
          f"nb = {layout.n_coo} blk_b = {layout.blk_b}", flush=True)
    tick("build")
    dom.converge_tol = 1e-6

    for fz in (f"/tmp/pikachu_freezes_pre_auxmg_r{refine}.pkl",
               f"/tmp/pikachu_freezes_r{refine}.pkl"):
        if os.path.exists(fz):
            try:
                dom.load_freezes(fz)
                tick(f"load_freezes({fz})")
                break
            except ValueError as e:
                print(e, flush=True)
    if getattr(dom, "_refined", None) is None:
        dom.freeze_linear_tangent()
        dom.freeze_refined_residual()
        dom.save_freezes(f"/tmp/pikachu_freezes_pre_auxmg_r{refine}.pkl")
        tick("freezes")
    dom.setup_auxmg(smooth=smooth, verbose=True)
    dom.free_volume_tables()
    tick("setup_auxmg")

    state = dom._runtime_state()
    tree0, (desc, hier) = dom._auxmg
    L = dom.pattern.max_time_level

    # production tangent at the initial x (close enough for timing)
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
    coo = (state.get("coo_rows"), state.get("coo_cols"))

    def A_of(vals):
        if layout.n_coo and coo[0] is not None:
            return OffsetMatrix(vals, coo[0], coo[1], layout)
        return OffsetMatrix.from_values(vals, layout)

    A = A_of(K_lin)
    tree = jax.jit(auxmg.refresh_tangent, static_argnums=2)(
        A, tree0, desc)
    op = auxmg.AuxMGOperator(A, tree, hier, desc)
    S = op._smoother()

    v0 = jnp.asarray(np.random.default_rng(3).standard_normal(n),
                     jnp.float32)

    def norm1(f):
        return lambda x, c: (lambda y: y / jnp.linalg.norm(y))(f(x, c))

    phases = {}
    phases["A.mv"] = chain_time(norm1(lambda x, A_: A_.mv(x)), v0,
                                consts=A, n=10)
    tick(f"A.mv {phases['A.mv']*1e3:.1f} ms")
    dense = OffsetMatrix(A.vals, jnp.zeros(0, jnp.int32),
                         jnp.zeros(0, jnp.int32),
                         auxmg._dense_only_layout(layout))
    phases["dense.mv"] = chain_time(norm1(lambda x, A_: A_.mv(x)), v0,
                                    consts=dense, n=20)
    tick(f"dense.mv {phases['dense.mv']*1e3:.1f} ms")
    if S is not A:
        phases["As.mv"] = chain_time(norm1(lambda x, S_: S_.mv(x)), v0,
                                     consts=S, n=20)
        tick(f"As.mv {phases['As.mv']*1e3:.1f} ms")

    def pt_(x, c):
        op_ = c
        rc = op_._pt(x)
        return x * (1.0 + 1e-12 * rc.reshape(-1)[0])

    phases["Pt"] = chain_time(pt_, v0, consts=op, n=10)
    tick(f"Pt {phases['Pt']*1e3:.1f} ms")

    xc0 = op._pt(v0)

    def p_(xc, c):
        op_ = c
        out = op_._p(xc)
        return xc * (1.0 + 1e-12 * out[0])

    phases["P"] = chain_time(p_, xc0, consts=op, n=10)
    tick(f"P {phases['P']*1e3:.1f} ms")

    def lat_(xc, c):
        op_ = c
        y = multigrid._vcycle_level(op_.hier, op_.tree["lat"], 0, xc)
        return y / jnp.linalg.norm(y)

    phases["lat_vcycle"] = chain_time(lat_, xc0, consts=op, n=10)
    tick(f"lat_vcycle {phases['lat_vcycle']*1e3:.1f} ms")

    phases["apply_m"] = chain_time(norm1(lambda x, c: c.apply_m(x)), v0,
                                   consts=op, n=6)
    tick(f"apply_m {phases['apply_m']*1e3:.1f} ms")
    phases["op.mv"] = chain_time(norm1(lambda x, c: c.mv(x)), v0,
                                 consts=op, n=6)
    tick(f"op.mv {phases['op.mv']*1e3:.1f} ms")

    # df residual (frozen A_td pair SpMV, per refine: L+1 of them + nl)
    ref = state["refined"]

    def df_res(xhi, c):
        ref_, (rows, cols) = c
        xdf = tf.DF(xhi, jnp.zeros_like(xhi))
        r = tf.DF(ref_["b_hi"], ref_["b_lo"])
        for td in range(L + 1):
            r = tf.df_add(r, tf.df_offset_mv(
                tf.DF(ref_["A_hi"][td], ref_["A_lo"][td]), layout, xdf,
                coo_rows=coo[0], coo_cols=coo[1]))
        return r.hi / jnp.linalg.norm(r.hi)

    phases["df_residual"] = chain_time(df_res, v0, consts=(ref, coo),
                                       n=6)
    tick(f"df_residual {phases['df_residual']*1e3:.1f} ms")

    # one inner bicgstab solve at the production budget
    def inner(b, c):
        op_ = c
        y, it, res = krylov.bicgstab(op_, b, tol=0.3 * jnp.linalg.norm(b)
                                     / np.sqrt(n), maxiter=12)
        return y / jnp.linalg.norm(y)

    phases["bicgstab(<=12)"] = chain_time(inner, v0, consts=op, n=4)
    tick(f"bicgstab {phases['bicgstab(<=12)']*1e3:.1f} ms")

    # measured full refine dispatch
    step = dom.make_refined_step(sv_func=krylov.bicgstab,
                                 precond="auxmg", maxiter=12,
                                 max_refine=1, max_pass=1, forcing=0.3)
    x0 = tf.df_from_f64(np.asarray(dom.x, np.float64))
    x1, _, res, _ = step(state, x0, jnp.float64(0.0), jnp.float64(1.0))
    jax.block_until_ready(x1.hi)
    tick("refine dispatch compile+warm")
    times = []
    for k in range(3):
        xp = tf.DF(x1.hi * np.float32(1.0 + 1e-4 * (k + 1)), x1.lo)
        jax.block_until_ready(xp)
        t1 = time.perf_counter()
        x2, _, res, _ = step(state, xp, jnp.float64(0.0),
                             jnp.float64(1.0))
        r = float(res)
        times.append(time.perf_counter() - t1)
    refine_ms = float(np.median(times)) * 1e3
    tick(f"refine dispatch: {refine_ms:.0f} ms (res {r:.2e})")

    print(f"\n== pikachu refine={refine} smooth={smooth} n={n} ==")
    for k, v in phases.items():
        print(f"  {k:>16}: {v*1e3:9.2f} ms")
    print(f"  {'refine dispatch':>16}: {refine_ms:9.1f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         sys.argv[2] if len(sys.argv) > 2 else "full")
