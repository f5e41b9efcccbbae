"""Fully-jitted time step: generalized-alpha predictor, Newton loop with
convergence break, preconditioned Krylov solve — one device dispatch.

The host-loop ``FEM_Domain.update_one_step`` mirrors the reference's
``update_OneStep!`` (residual norms pulled to the host per Newton
iteration, solver/04_Time_Domain.jl:59-80) and is convenient for printing
and user callbacks between iterations.  For production stepping — and
especially through a remote-device transport where every host readback
costs a round trip — this variant stages the whole step as one jitted
function: the Newton iteration is a ``lax.while_loop`` carrying
(x_star, dx, residual norm), with the Krylov solver nested inside.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..linsolve import krylov
from ..linsolve.precond import pr_jacobi
from ..linsolve.block_offset import OffsetMatrix
from .time_domain import initialize_dx, x_star_of


def _df_jit(fun):
    """jit for programs carrying two-float (DF) arithmetic.  XLA:CPU's
    fusion emitter miscompiles error-free transforms whose producers are
    fused in (duplicated subgraphs diverge at f32 level — see
    twofloat._pin); disabling the fusion pass for these programs on the
    CPU backend restores exact DF semantics (measured: composed df
    residual 1.5e-3 -> 2.7e-10 absolute error).  TPU preserves DF
    semantics under full fusion (verified on-chip) and compiles
    normally — the hot path keeps XLA's fusions."""
    if jax.default_backend() == "cpu":
        return jax.jit(fun,
                       compiler_options={"xla_disable_hlo_passes": "fusion"})
    return jax.jit(fun)


def make_jitted_step(domain, sv_func: Callable = krylov.bicgstab,
                     maxiter: int = 2000, max_newton: int = 4,
                     max_pass: int = 2, precond: str = "jacobi",
                     mg_opts: dict = None, forcing: float = 1e-2,
                     stall_ratio: float = 0.9,
                     static_k_linear: bool = False,
                     reuse_mg: bool = False, rowshard_mesh=None,
                     **sv_kwargs):
    """Build ``step(state, x, t, dt) -> (x_new, dx, res, n_newton)``.

    ``state`` is the runtime pytree (geometry, fields, maps, user);
    converge_tol is read from the domain at build time.  Every Newton
    iteration assembles the residual/tangent and solves with ``sv_func``.

    ``precond``: 'jacobi' (right diagonal scaling, the reference's
    Pr_Jacobi!) or 'mg' — lattice geometric multigrid V-cycle as a right
    preconditioner (linsolve/multigrid.py; structured single-workpiece
    meshes).  MG turns the O(h^-2)-conditioned tangent into an O(1)
    iteration count and is the production path at >=1M DOF.

    ``forcing``: inexact-Newton forcing term — each inner Krylov pass
    stops at max(converge_tol, forcing * ||rhs||/sqrt(n)).  Without it,
    a converge_tol below the f32 residual floor makes every inner solve
    burn its full maxiter with zero progress (measured: 2.5 s/step vs
    0.6 s at 1.28M DOF).  ``stall_ratio``: the Newton loop also exits
    when the residual fails to shrink by that factor (floor detection —
    the reference's Newton has no such guard, it just caps max_iter).

    ``static_k_linear``: combine the per-td components cached by
    ``domain.freeze_linear_tangent()`` instead of re-assembling the
    linear tangent every step (static geometry/fields).  ``reuse_mg``:
    use the MG state built once by ``domain.setup_mg()`` instead of
    probing a fresh hierarchy per step.  Together they cut the fixed
    per-step cost from ~635 ms to the two Newton assemblies at 1M DOF.

    ``rowshard_mesh``: a ``jax.sharding.Mesh`` with an 'el' axis — the
    scale-out layout (parallel/rowshard.py): the assembled K storage and
    every solver vector are sharded along their row/storage axis, so
    assembly lands as a ReduceScatter onto the shards, the SpMV is
    row-parallel, and the Krylov dots psum over the mesh.  Pass a state
    placed by ``shard_domain_state``.  Works with both preconditioners:
    'jacobi' (pure row-parallel Krylov) and 'mg' — the fine-level
    V-cycle smoother runs sharded over the mesh (stencil shifts lower
    to halo exchanges; shard_domain_state places a frozen ``setup_mg``
    state with the fine level split, rowshard.shard_mg_state), which is
    the production scale-out path: Jacobi alone cannot converge the
    O(h^-2)-conditioned tangent at the sizes that need >1 chip.
    """
    pattern = domain.pattern
    ga = domain.time_discretization
    gamma = tuple(ga.gamma_params)
    alpha = tuple(ga.alpha_params)
    tol = float(domain.converge_tol)
    L = pattern.max_time_level
    diag_pos = None  # OffsetMatrix.diag() is position-free
    domain._ensure_device_maps("lin", "nl")
    res_k = domain._res_k.__wrapped__
    k_linear = domain._k_linear.__wrapped__
    sqrt_n = np.sqrt(pattern.basicfield_size)

    def A_of(vals, state):
        """OffsetMatrix with COO-tail indices from the traced state (see
        make_refined_step's A_of — avoids giant HLO constants on
        unstructured meshes)."""
        rows = state.get("coo_rows")
        if pattern.offset_layout.n_coo and rows is not None:
            return OffsetMatrix(vals, rows, state["coo_cols"],
                                pattern.offset_layout)
        return OffsetMatrix.from_values(vals, pattern.offset_layout)

    mg_hier = None
    if precond == "mg":
        from ..linsolve import multigrid
        if reuse_mg and getattr(domain, "_mg_hier", None) is not None:
            # the frozen state was built for THIS hierarchy (incl. any
            # nu1/nu2/max_coarse overrides passed to setup_mg)
            mg_hier = domain._mg_hier
        else:
            mg_hier = multigrid.hierarchy_for_domain(domain,
                                                     **(mg_opts or {}))
    elif precond != "jacobi":
        raise ValueError(f"unknown precond {precond!r}")
    if rowshard_mesh is not None:
        from ..parallel.rowshard import (RowShardedOp, RowShardedMGOperator,
                                         constrain)
    else:
        RowShardedOp = RowShardedMGOperator = None
        constrain = lambda _mesh, v: v

    @jax.jit
    def step(state, x, t, dt):
        levels = L + 1
        prod_gamma = jnp.asarray(
            [np.prod(gamma[:i]) for i in range(levels)], x.dtype)
        dt_pow = jnp.stack([dt ** i for i in range(levels)]).astype(x.dtype)
        beta = 1.0 / (prod_gamma * dt_pow)
        K_params = jnp.asarray(alpha[:levels], x.dtype) * beta

        st = dict(state)
        st["t"], st["dt"], st["K_params"] = t, dt, K_params
        st["x_star"] = x
        if static_k_linear:
            # explicit scalar*vector adds: einsum("t,ts->s") over the
            # [L+1, n_storage] stack measured 28 ms at 27M values on TPU
            # (layout-hostile dot_general); this form runs at bandwidth
            K_td = st["K_linear_td"]
            K_lin = K_params[0] * K_td[0]
            for td in range(1, levels):
                K_lin = K_lin + K_params[td] * K_td[td]
            if st.get("ghost_diag") is not None:
                K_lin = K_lin + st["ghost_diag"]
        else:
            K_lin = k_linear(st)
        st["K_linear"] = constrain(rowshard_mesh, K_lin)
        dx0 = initialize_dx(x, dt, gamma)

        def res_of(dx):
            st2 = dict(st)
            st2["x_star"] = x_star_of(x, dx, alpha)
            residue, K_total = res_k(st2)
            # row-shard layout: land the assembly as a reduce-scatter
            # onto the storage/row shards instead of a full AllReduce
            return (constrain(rowshard_mesh, residue),
                    constrain(rowshard_mesh, K_total))

        # MG preconditioner: set up ONCE per step from the predictor-state
        # tangent and frozen across Newton iterations (re-probing per
        # iteration costs ~n_off x m^dim operator applications; a frozen
        # V-cycle stays an O(1)-quality preconditioner for the slowly
        # varying tangent — the standard frozen-preconditioner Newton).
        residue0, K0 = res_of(dx0)
        res0 = jnp.linalg.norm(residue0) / sqrt_n
        mg_state = None
        if mg_hier is not None:
            if reuse_mg:
                mg_state = st["mg_frozen"]
            else:
                from ..linsolve import multigrid
                A0 = A_of(K0, state)
                mg_state = multigrid.mg_setup(mg_hier, A0,
                                              st.get("mg_mask"))

        def inner_tol(rr):
            # inexact-Newton forcing: never ask the Krylov pass for more
            # than a `forcing` relative reduction of this pass's rhs
            return jnp.maximum(jnp.asarray(tol, rr.dtype),
                               forcing * jnp.linalg.norm(rr) / sqrt_n)

        def cond(carry):
            dx, res, res_prev, it = carry
            return ((res > tol) & (it < max_newton)
                    & (res < stall_ratio * res_prev))

        def body(carry):
            dx, res_in, _, it = carry
            residue, K_total = res_of(dx)
            A = A_of(K_total, state)
            # restart passes with true-residual recomputation (the
            # iterative_Solve! pattern; doubles as iterative refinement
            # against f32 drift in the Krylov recurrences)
            delta = jnp.zeros_like(residue)
            rr = residue
            if mg_hier is not None:
                from ..linsolve import multigrid
                op = multigrid.MGOperator(A, mg_state, mg_hier)
                if RowShardedMGOperator is not None:
                    # scale-out MG: the fine-level smoother runs sharded
                    # (halo exchanges over the mesh), Krylov dots psum
                    op = RowShardedMGOperator(op, rowshard_mesh)
                for _ in range(max_pass):
                    y_i, _, _ = sv_func(op, rr, tol=inner_tol(rr),
                                        maxiter=maxiter, **sv_kwargs)
                    delta = delta + op.apply_m(y_i)
                    rr = residue - A.mv(delta)
            else:
                A, unscale = pr_jacobi(A, diag_pos)
                if RowShardedOp is not None:
                    # every Krylov mv lands row-sharded; GSPMD turns the
                    # recurrence dots into local-dot + psum over the mesh
                    A = RowShardedOp(A, rowshard_mesh)
                for _ in range(max_pass):
                    d_i, _, _ = sv_func(A, rr, tol=inner_tol(rr),
                                        maxiter=maxiter, **sv_kwargs)
                    delta = delta + d_i
                    rr = residue - A.mv(delta)
                delta = unscale(delta)
            dx = dx + beta[:, None] * (-delta)[None, :]  # update_dx!
            residue2, _ = res_of(dx)
            res2 = jnp.linalg.norm(residue2) / sqrt_n
            return dx, res2, res_in, it + 1

        big = jnp.asarray(np.finfo(np.float32).max, res0.dtype)
        dx, res, _, it = jax.lax.while_loop(cond, body,
                                            (dx0, res0, big, 0))
        return x + dx, dx, res, it

    return step


def make_refined_step(domain, sv_func: Callable = krylov.bicgstab,
                      maxiter: int = 60, max_refine: int = 10,
                      max_pass: int = 1, precond: str = "mg",
                      forcing: float = 1e-2, stall_ratio: float = 0.9,
                      residual_mode: str = None, rowshard_mesh=None,
                      inner_operator: str = "exact",
                      static_nl_tangent: bool = False,
                      **sv_kwargs):
    """Newton / mixed-precision-iterative-refinement step with **exact
    residuals** and working-precision (f32) tangent solves.

    Build ``step(state, x, t, dt) -> (x_new, dx, res, n_iter)``.  Every
    iteration:

    1. residual via the frozen affine decomposition
       (``domain.freeze_refined_residual``): offset-SpMVs against the
       exact A_td/b plus the small nonaffine boundary remainder — no
       volume assembly at all for affine-volume physics;
    2. fresh tangent = frozen linear part (``freeze_linear_tangent``)
       + the per-iteration nonaffine gradient blocks — a true Newton
       tangent, so convergence is quadratic, not stationary-iteration;
    3. f32 MG-Krylov solve (frozen MG from ``setup_mg``) with
       inexact-Newton forcing.

    ``residual_mode``: how the high-precision residual arithmetic runs.

    * ``"df32"`` (default on TPU): two-float f32 pairs (twofloat.py) —
      ~2^-48 relative accuracy at native VPU rate.  ``x`` is carried as
      a ``twofloat.DF`` pair across steps (a plain f64 array is also
      accepted and split on entry; the return matches the input kind).
      The nonaffine boundary residues still evaluate in f64, on
      boundary-sized arrays only (cheap even emulated).
    * ``"f64"`` (default on CPU): plain f64 vectors — native on the
      host, software-emulated and ~30-800x slower on TPU (measured:
      100 ms per f64 offset-SpMV at 1.28M DOF vs ~1 ms df32).

    Either mode reaches the reference's 1e-6 normalized-residual bar
    (pikachu.jl:106) and far below — an f32-stored solution alone can
    only ever realize a ~1e-7|K||x| residual, which is why x persists in
    extended precision between steps.

    ``rowshard_mesh``: scale-out layout (parallel/rowshard.py), same as
    ``make_jitted_step``'s — the frozen A_td offset-SpMVs, the residual
    pairs, and the tangent storage all land row-sharded over the mesh's
    'el' axis; the fine-level MG V-cycle runs sharded (halo exchanges)
    and every Krylov/Chebyshev dot psums over the mesh.  Pass a state
    placed by ``shard_domain_state`` (which row-blocks the frozen
    ``refined`` operator and the ``K_linear_td`` stack).

    Requires ``freeze_linear_tangent()``, ``freeze_refined_residual()``
    and ``setup_mg()`` (precond='mg', lattice meshes) or
    ``setup_auxmg()`` (precond='auxmg', unstructured meshes)."""
    import jax as _jax
    from ..linsolve import twofloat as tf
    if getattr(domain, "_refined", None) is None:
        raise RuntimeError("call domain.freeze_refined_residual() first")
    if getattr(domain, "_k_linear_td", None) is None:
        raise RuntimeError("call domain.freeze_linear_tangent() first")
    if residual_mode is None:
        residual_mode = ("f64" if _jax.default_backend() == "cpu"
                         else "df32")
    if residual_mode not in ("f64", "df32"):
        raise ValueError(f"unknown residual_mode {residual_mode!r}")
    # only the nonaffine phases assemble on device in this step — the
    # volume 'lin'/'nl' maps stay host-side (GBs on unstructured meshes)
    domain._ensure_device_maps(
        *(("nonaff_nl",) if residual_mode == "f64"
          else ("nonaff_res", "nl_grad")))
    pattern = domain.pattern
    ga = domain.time_discretization
    gamma = tuple(ga.gamma_params)
    alpha = tuple(ga.alpha_params)
    tol = float(domain.converge_tol)
    L = pattern.max_time_level
    layout = pattern.offset_layout
    run_phase = domain._run_phase
    sqrt_n = float(np.sqrt(pattern.basicfield_size))
    sdtype = domain.dtype                       # solve (tangent) precision
    bfs = pattern.basicfield_size

    def A_of(vals, state):
        """OffsetMatrix with the COO-tail indices from the traced state
        (device arrays shipped once by _runtime_state) — NOT baked in as
        program constants, which at 1M+ DOF unstructured is hundreds of
        MB of HLO and overflows the remote-compile transport."""
        rows = state.get("coo_rows")
        if layout.n_coo and rows is not None:
            return OffsetMatrix(vals, rows, state["coo_cols"], layout)
        return OffsetMatrix.from_values(vals, layout)

    mg_hier = None
    aux_static = None
    if precond == "mg":
        from ..linsolve import multigrid
        if getattr(domain, "_mg_frozen", None) is None:
            raise RuntimeError("call domain.setup_mg() first")
        # reuse the hierarchy the frozen state was built for (setup_mg
        # may have overridden nu1/nu2/max_coarse)
        mg_hier = (getattr(domain, "_mg_hier", None)
                   or multigrid.hierarchy_for_domain(domain))
    elif precond == "auxmg":
        # unstructured meshes: frozen auxiliary-space hierarchy
        # (auxmg.py) with the fine Jacobi diagonal refreshed per tangent
        if getattr(domain, "_auxmg", None) is None:
            raise RuntimeError("call domain.setup_auxmg() first")
        aux_static = domain._auxmg[1]           # (desc, hier)
    elif precond != "jacobi":
        raise ValueError(f"unknown precond {precond!r}")
    if inner_operator not in ("exact", "sparse"):
        raise ValueError(f"unknown inner_operator {inner_operator!r}")
    if inner_operator == "sparse":
        if aux_static is None or aux_static[0].smooth != "sparse":
            raise ValueError(
                "inner_operator='sparse' needs precond='auxmg' with "
                "setup_auxmg(smooth='sparse') — the sparsified tangent "
                "IS the aux smoother operator")

    if sv_func is krylov.chebyshev:
        # Static Chebyshev trip count and spectrum enclosure from the
        # measured preconditioned spectrum (setup_mg / setup_auxmg).
        # The outer loop measures TRUE residuals, so a drifting bound
        # only slows convergence — it cannot corrupt the answer.
        if precond == "mg":
            tuned = getattr(domain, "_mg_cheb", None)
        elif precond == "auxmg":
            tuned = getattr(domain, "_auxmg_cheb", None)
        else:
            raise ValueError("chebyshev inner solves need an MG "
                             "preconditioner (precond='mg'/'auxmg')")
        if tuned is None:
            raise RuntimeError(
                "chebyshev inner solves need the tuned enclosure from "
                "setup_mg()/setup_auxmg() — None there means Chebyshev "
                "can't contract this operator; use a Krylov sv_func")
        interval, rate = tuned
        # trip count from the MEASURED rate (spectrum-edge predictions
        # are optimistic when the preconditioned modes cluster)
        n_cheb = int(np.ceil(np.log(forcing / 2.0) / np.log(rate)))
        maxiter = int(np.clip(n_cheb, 2, maxiter))
        sv_kwargs = {**sv_kwargs, "interval": interval}

    def combine_klin(state, K_params_s):
        # explicit per-level scalar*vector adds: an einsum("t,ts->s")
        # over the [L+1, n_storage] stack measured 28 ms at 27M storage
        # values (layout-hostile dot_general); this form is ~bandwidth
        K_td = state["K_linear_td"]
        K = K_params_s[0] * K_td[0]
        for td in range(1, L + 1):
            K = K + K_params_s[td] * K_td[td]
        if state.get("ghost_diag") is not None:
            K = K + state["ghost_diag"]
        return K

    if rowshard_mesh is not None:
        from ..parallel.rowshard import (RowShardedMGOperator,
                                         RowShardedOp, constrain)
        con = lambda v: constrain(rowshard_mesh, v)
    else:
        RowShardedMGOperator = RowShardedOp = None
        con = lambda v: v

    def con_df(r):
        return tf.DF(con(r.hi), con(r.lo)) if rowshard_mesh is not None \
            else r

    def solve_f32(state, A, rr, tol_i):
        delta = jnp.zeros_like(rr)
        if mg_hier is not None or aux_static is not None:
            if mg_hier is not None:
                from ..linsolve import multigrid
                op = multigrid.MGOperator(A, state["mg_frozen"], mg_hier)
            else:
                from ..linsolve import auxmg as _auxmg
                desc, hier = aux_static
                # per-tangent refresh: Jacobi diagonal + (smooth='sparse')
                # the gather-free sparsified smoothing pieces
                tree = _auxmg.refresh_tangent(A, state["auxmg_tree"],
                                              desc)
                op = _auxmg.AuxMGOperator(A, tree, hier, desc)
            if inner_operator == "sparse":
                # tail-free inner iteration: Krylov on Ã∘M (the
                # sparsified tangent); the outer loop's TRUE residual
                # absorbs the sparsification error as extra refines
                op_in = _auxmg.SparseInnerOp(op)
            else:
                op_in = op
            if RowShardedMGOperator is not None:
                # scale-out: the fine-level V-cycle runs sharded over
                # the mesh (halo exchanges), Krylov dots psum
                op_in = RowShardedMGOperator(op_in, rowshard_mesh)
            r0 = rr
            for _ in range(max_pass):
                y_i, _, _ = sv_func(op_in, rr, tol=tol_i, maxiter=maxiter,
                                    **sv_kwargs)
                delta = delta + op_in.apply_m(y_i)
                rr = r0 - A.mv(delta)
        else:
            As, unscale = pr_jacobi(A, None)
            if RowShardedOp is not None:
                As = RowShardedOp(As, rowshard_mesh)
            r0 = rr
            for _ in range(max_pass):
                d_i, _, _ = sv_func(As, rr, tol=tol_i, maxiter=maxiter,
                                    **sv_kwargs)
                delta = delta + d_i
                rr = r0 - As.mv(delta)
            delta = unscale(delta)
        return delta

    def inner_tol(res_n, dtype):
        return jnp.maximum(jnp.asarray(tol, dtype),
                           jnp.asarray(forcing, dtype) * res_n)

    # volume-nonaffine physics (hyperelasticity, convection): the freeze
    # stores two-float geometry tables (wp_df) instead of f64 views
    vol_nonaff = domain._refined.get("wp_df") is not None

    def _nonaff_wp64(ref):
        """f64 table views for the f64 residual mode, reconstructed
        exactly from the DF pairs when the freeze stored those."""
        if not vol_nonaff:
            return ref["wp"]
        return jax.tree_util.tree_map(
            lambda v: tf.df_to_f64(v) if isinstance(v, tf.DF) else v,
            ref["wp_df"], is_leaf=lambda v: isinstance(v, tf.DF))

    if residual_mode == "f64":
        @jax.jit
        def step(state, x, t, dt):
            f64 = jnp.float64
            if isinstance(x, tf.DF):
                x = tf.df_to_f64(x)
            x = x.astype(f64)
            levels = L + 1
            prod_gamma = jnp.asarray(
                [np.prod(gamma[:i]) for i in range(levels)], f64)
            dt64 = dt.astype(f64)
            dt_pow = jnp.stack([dt64 ** i for i in range(levels)])
            beta = 1.0 / (prod_gamma * dt_pow)
            K_params64 = jnp.asarray(alpha[:levels], f64) * beta

            ref = state["refined"]
            A64 = (ref["A_hi"].astype(f64)
                   + ref["A_lo"].astype(f64))     # [levels, n_storage]
            b64 = ref["b_hi"].astype(f64) + ref["b_lo"].astype(f64)
            K_lin = con(combine_klin(state, K_params64.astype(sdtype)))

            def residual_and_knl(dx, with_grad=True):
                xs = x_star_of(x, dx, alpha)                    # f64
                r = b64
                for td in range(levels):
                    Atd = A_of(A64[td], state)
                    r = r + Atd.mv(xs[td])
                st64 = {**state, "wp": _nonaff_wp64(ref), "x_star": xs,
                        "K_params": K_params64,
                        "t": t.astype(f64), "dt": dt64}
                r_nl, K_nl = run_phase(st64, "nonaff_nl")
                return con(r + r_nl), (con(K_nl) if with_grad else None)

            dx0 = initialize_dx(x, dt64, gamma)
            r0, K0 = residual_and_knl(dx0)
            res0 = jnp.linalg.norm(r0) / sqrt_n

            def cond(carry):
                dx, r64, K_nl, res, res_prev, it = carry
                return ((res > tol) & (it < max_refine)
                        & (res < stall_ratio * res_prev))

            def body(carry):
                dx, r64, K_nl, res_in, _, it = carry
                A = A_of(K_lin + K_nl.astype(sdtype), state)
                rr = r64.astype(sdtype)
                delta = solve_f32(state, A, rr,
                                  inner_tol(res_in.astype(sdtype),
                                            sdtype))
                dx = dx + beta[:, None] * (-delta.astype(f64))[None, :]
                r64b, K_nlb = residual_and_knl(
                    dx, with_grad=not static_nl_tangent)
                if K_nlb is None:
                    K_nlb = K_nl
                res2 = jnp.linalg.norm(r64b) / sqrt_n
                return dx, r64b, K_nlb, res2, res_in, it + 1

            big = jnp.asarray(np.finfo(np.float32).max, f64)
            dx, _, _, res, _, it = jax.lax.while_loop(
                cond, body, (dx0, r0, K0, res0, big, 0))
            return x + dx, dx, res, it

        return step

    # ---------------- df32 mode (the TPU production path) --------------
    if domain.dtype != jnp.float32:
        raise ValueError("residual_mode='df32' expects an f32 domain")
    ref_host = domain._refined
    has_nonaff_res = "r_touched" in getattr(
        domain, "_device_maps", {}).get("nonaff_res", {})

    @_df_jit
    def step(state, x, t, dt):
        f32, f64 = jnp.float32, jnp.float64
        if isinstance(x, tf.DF):
            xdf = x
            as_df = True
        else:
            hi = x.astype(f32)
            xdf = tf.DF(hi, (x - hi.astype(f64)).astype(f32))
            as_df = False
        levels = L + 1
        prod_gamma = np.asarray(
            [np.prod(gamma[:i]) for i in range(levels)])
        dt64 = dt.astype(f64)
        dt_pow = jnp.stack([dt64 ** i for i in range(levels)])
        beta64 = 1.0 / (jnp.asarray(prod_gamma, f64) * dt_pow)
        K_params64 = jnp.asarray(alpha[:levels], f64) * beta64
        beta32 = beta64.astype(f32)

        ref = state["refined"]
        A_df = tf.DF(ref["A_hi"], ref["A_lo"])
        b_df = tf.DF(ref["b_hi"], ref["b_lo"])
        bnd = ref["bnd_dofs"]
        K_lin = con(combine_klin(state, K_params64.astype(f32)))
        alpha32 = jnp.asarray(alpha[:levels], f32)[:, None]

        # generalized-alpha predictor in df arithmetic
        def df_initialize_dx(xp, dtp):
            dx_hi = jnp.zeros_like(xp.hi)
            dx_lo = jnp.zeros_like(xp.lo)
            for level in range(levels - 1, 0, -1):
                g = float(gamma[level - 1])
                row = tf.df_add(tf.DF(xp.hi[level], xp.lo[level]),
                                tf.df_scale(tf.DF(dx_hi[level],
                                                  dx_lo[level]), g))
                row = tf.df_scale_df(row, dtp)
                dx_hi = dx_hi.at[level - 1].set(row.hi)
                dx_lo = dx_lo.at[level - 1].set(row.lo)
            return tf.DF(dx_hi, dx_lo)

        dt_hi = dt64.astype(f32)
        dtp = tf.DF(dt_hi, (dt64 - dt_hi.astype(f64)).astype(f32))

        def residual_and_knl(dxdf, with_grad=True):
            xs = tf.df_add(xdf, tf.df_scale(dxdf, alpha32))
            r = b_df
            for td in range(levels):
                r = tf.df_add(r, tf.df_offset_mv(
                    tf.DF(A_df.hi[td], A_df.lo[td]), layout,
                    tf.DF(xs.hi[td], xs.lo[td]),
                    coo_rows=state.get("coo_rows"),
                    coo_cols=state.get("coo_cols")))
            # Nonaffine residues.  Volume-nonaffine physics
            # (hyperelasticity, convection): evaluate ALL nonaffine
            # residues in two-float arithmetic over the frozen DF
            # geometry (df_lowering.py) — f64-quality values at native
            # f32 rate, no emulated-f64 volume work.
            if vol_nonaff:
                st_df = {**state, "wp": ref["wp_df"], "x_star": xs,
                         "K_params": K_params64,
                         "t": t.astype(f64), "dt": dt64}
                r_nl_df, _ = run_phase(st_df, "nonaff_res_df")
                r = tf.df_add(r, r_nl_df)
            # Boundary-only nonaffinity: f64 on boundary-sized data —
            # x* materialized in f64 ONLY at the boundary DOF slots.
            # Fully affine physics (e.g. pure-convection thermal) has no
            # nonaffine residues at all — skip the block entirely.
            elif has_nonaff_res:
                xs_b64 = (xs.hi[:, bnd].astype(f64)
                          + xs.lo[:, bnd].astype(f64))
                xs64 = jnp.zeros((levels, bfs), f64).at[:, bnd].set(xs_b64)
                st64 = {**state, "wp": ref["wp"], "x_star": xs64,
                        "K_params": K_params64, "r_compact": True,
                        "t": t.astype(f64), "dt": dt64}
                r_nl_c, _ = run_phase(st64, "nonaff_res")   # compact f64
                touched = state["maps"]["nonaff_res"]["r_touched"]
                # exact add of the compact remainder into the pair at the
                # touched rows (all ops on touched-sized arrays)
                r_t64 = (r.hi[touched].astype(f64)
                         + r.lo[touched].astype(f64) + r_nl_c)
                t_hi = r_t64.astype(f32)
                t_lo = (r_t64 - t_hi.astype(f64)).astype(f32)
                r = tf.DF(r.hi.at[touched].set(t_hi),
                          r.lo.at[touched].set(t_lo))
            # nonaffine tangent blocks in plain f32 (tangent accuracy
            # only affects the convergence rate, not the answer).  With
            # static_nl_tangent the blocks are assembled ONCE per step
            # (at the predictor) and frozen across refines — the drift
            # over a warm step's ~1e-4 perturbation is noise next to the
            # inexact-Newton forcing, and the assembly is ~36 ms/call at
            # 1.44M-DOF 3D (boundary gather maps, 19% of the step).
            if not with_grad:
                return con_df(r), None
            st32 = {**state, "x_star": xs.hi,
                    "K_params": K_params64.astype(f32)}
            _, K_nl = run_phase(st32, "nl_grad")
            return con_df(r), con(K_nl)

        def norm_n(r):
            return jnp.linalg.norm(r.hi) / sqrt_n

        dx0 = df_initialize_dx(xdf, dtp)
        r0, K0 = residual_and_knl(dx0)
        res0 = norm_n(r0)

        def cond(carry):
            dx_hi, dx_lo, r_hi, r_lo, K_nl, res, res_prev, it = carry
            return ((res > tol) & (it < max_refine)
                    & (res < stall_ratio * res_prev))

        def body(carry):
            dx_hi, dx_lo, r_hi, r_lo, K_nl, res_in, _, it = carry
            A = A_of(K_lin + K_nl, state)
            delta = solve_f32(state, A, r_hi, inner_tol(res_in, f32))
            dxdf = tf.df_add_f32(tf.DF(dx_hi, dx_lo),
                                 -beta32[:, None] * delta[None, :])
            r2, K2 = residual_and_knl(
                dxdf, with_grad=not static_nl_tangent)
            if K2 is None:
                K2 = K_nl
            res2 = norm_n(r2)
            return (dxdf.hi, dxdf.lo, r2.hi, r2.lo, K2, res2, res_in,
                    it + 1)

        big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
        dx_hi, dx_lo, _, _, _, res, _, it = jax.lax.while_loop(
            cond, body,
            (dx0.hi, dx0.lo, r0.hi, r0.lo, K0, res0, big, 0))
        dxdf = tf.DF(dx_hi, dx_lo)
        x_new = tf.df_add(xdf, dxdf)
        if not as_df:
            return (tf.df_to_f64(x_new), tf.df_to_f64(dxdf),
                    res.astype(jnp.float64), it)
        return x_new, dxdf, res.astype(jnp.float64), it

    return step
