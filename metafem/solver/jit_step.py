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


def make_jitted_step(domain, sv_func: Callable = krylov.bicgstab,
                     maxiter: int = 2000, max_newton: int = 4,
                     max_pass: int = 2, precond: str = "jacobi",
                     mg_opts: dict = None, forcing: float = 1e-2,
                     stall_ratio: float = 0.9,
                     static_k_linear: bool = False,
                     reuse_mg: bool = False, **sv_kwargs):
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
    """
    pattern = domain.pattern
    ga = domain.time_discretization
    gamma = tuple(ga.gamma_params)
    alpha = tuple(ga.alpha_params)
    tol = float(domain.converge_tol)
    L = pattern.max_time_level
    diag_pos = None  # OffsetMatrix.diag() is position-free
    res_k = domain._res_k.__wrapped__
    k_linear = domain._k_linear.__wrapped__
    sqrt_n = np.sqrt(pattern.basicfield_size)

    mg_hier = None
    if precond == "mg":
        from ..linsolve import multigrid
        mg_hier = multigrid.hierarchy_for_domain(domain, **(mg_opts or {}))
    elif precond != "jacobi":
        raise ValueError(f"unknown precond {precond!r}")

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
            K_lin = jnp.einsum("t,ts->s", K_params, st["K_linear_td"])
            if st.get("ghost_diag") is not None:
                K_lin = K_lin + st["ghost_diag"]
        else:
            K_lin = k_linear(st)
        st["K_linear"] = K_lin
        dx0 = initialize_dx(x, dt, gamma)

        def res_of(dx):
            st2 = dict(st)
            st2["x_star"] = x_star_of(x, dx, alpha)
            residue, K_total = res_k(st2)
            return residue, K_total

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
                A0 = OffsetMatrix.from_values(K0, pattern.offset_layout)
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
            A = OffsetMatrix.from_values(K_total, pattern.offset_layout)
            # restart passes with true-residual recomputation (the
            # iterative_Solve! pattern; doubles as iterative refinement
            # against f32 drift in the Krylov recurrences)
            delta = jnp.zeros_like(residue)
            rr = residue
            if mg_hier is not None:
                from ..linsolve import multigrid
                op = multigrid.MGOperator(A, mg_state, mg_hier)
                for _ in range(max_pass):
                    y_i, _, _ = sv_func(op, rr, tol=inner_tol(rr),
                                        maxiter=maxiter, **sv_kwargs)
                    delta = delta + op.apply_m(y_i)
                    rr = residue - A.mv(delta)
            else:
                A, unscale = pr_jacobi(A, diag_pos)
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
                      **sv_kwargs):
    """Newton / mixed-precision-iterative-refinement step with **exact
    f64 residuals** and working-precision (f32) tangent solves.

    Build ``step(state, x64, t, dt) -> (x64_new, dx64, res, n_iter)``
    where ``x64`` persists in f64 across steps (an f32-stored solution
    can only ever realize a ~1e-7|K||x| residual, the f32 floor).  Every
    iteration:

    1. residual via the frozen affine decomposition
       (``domain.freeze_refined_residual``): f64 offset-SpMVs against
       A_td + b + the small nonaffine remainder assembly in f64 — no
       volume assembly at all for affine-volume physics;
    2. fresh tangent = frozen linear part (``freeze_linear_tangent``)
       + the per-iteration nonaffine gradient blocks — a true Newton
       tangent, so convergence is quadratic, not stationary-iteration;
    3. f32 MG-Krylov solve (frozen MG from ``setup_mg``) with
       inexact-Newton forcing; correction applied in f64.

    Compared with the plain f32 ``make_jitted_step`` this reaches the
    reference's 1e-6 normalized-residual tolerances (pikachu.jl:106) —
    and far below — at near-f32 cost: the only f64 device work is a few
    bandwidth-bound SpMVs/norms per iteration plus the (typically
    boundary-only) remainder assembly.

    Requires: ``freeze_linear_tangent()``, ``freeze_refined_residual()``
    and (for precond='mg') ``setup_mg()`` to have been called."""
    if getattr(domain, "_refined", None) is None:
        raise RuntimeError("call domain.freeze_refined_residual() first")
    if getattr(domain, "_k_linear_td", None) is None:
        raise RuntimeError("call domain.freeze_linear_tangent() first")
    pattern = domain.pattern
    ga = domain.time_discretization
    gamma = tuple(ga.gamma_params)
    alpha = tuple(ga.alpha_params)
    tol = float(domain.converge_tol)
    L = pattern.max_time_level
    layout = pattern.offset_layout
    run_phase = domain._run_phase
    sqrt_n = np.sqrt(pattern.basicfield_size)
    sdtype = domain.dtype                       # solve (tangent) precision

    mg_hier = None
    if precond == "mg":
        from ..linsolve import multigrid
        mg_hier = multigrid.hierarchy_for_domain(domain)
        if getattr(domain, "_mg_frozen", None) is None:
            raise RuntimeError("call domain.setup_mg() first")
    elif precond != "jacobi":
        raise ValueError(f"unknown precond {precond!r}")

    @jax.jit
    def step(state, x, t, dt):
        f64 = jnp.float64
        x = x.astype(f64)
        levels = L + 1
        prod_gamma = jnp.asarray(
            [np.prod(gamma[:i]) for i in range(levels)], f64)
        dt64 = dt.astype(f64)
        dt_pow = jnp.stack([dt64 ** i for i in range(levels)])
        beta = 1.0 / (prod_gamma * dt_pow)
        K_params64 = jnp.asarray(alpha[:levels], f64) * beta

        ref = state["refined"]
        A64, b64 = ref["A64"], ref["b64"]       # [levels, nnz], [bfs]
        K_lin = jnp.einsum("t,ts->s", K_params64.astype(sdtype),
                           state["K_linear_td"])
        if state.get("ghost_diag") is not None:
            K_lin = K_lin + state["ghost_diag"]
        mg_state = state["mg_frozen"] if mg_hier is not None else None

        def residual_and_knl(dx):
            xs = x_star_of(x, dx, alpha)                        # f64
            r = b64
            for td in range(levels):
                Atd = OffsetMatrix.from_values(A64[td], layout)
                r = r + Atd.mv(xs[td])
            st64 = {**state, "wp": ref["wp"], "x_star": xs,
                    "K_params": K_params64,
                    "t": t.astype(f64), "dt": dt64}
            r_nl, K_nl = run_phase(st64, "nonaff_nl")
            return r + r_nl, K_nl

        def inner_tol(rr):
            return jnp.maximum(jnp.asarray(tol, rr.dtype),
                               forcing * jnp.linalg.norm(rr) / sqrt_n)

        dx0 = initialize_dx(x, dt64, gamma)
        r0, K0 = residual_and_knl(dx0)
        res0 = jnp.linalg.norm(r0) / sqrt_n

        def cond(carry):
            dx, r64, K_nl, res, res_prev, it = carry
            return ((res > tol) & (it < max_refine)
                    & (res < stall_ratio * res_prev))

        def body(carry):
            dx, r64, K_nl, res_in, _, it = carry
            A = OffsetMatrix.from_values(K_lin + K_nl.astype(sdtype),
                                         layout)
            rr = r64.astype(sdtype)
            delta = jnp.zeros_like(rr)
            if mg_hier is not None:
                from ..linsolve import multigrid
                op = multigrid.MGOperator(A, mg_state, mg_hier)
                for _ in range(max_pass):
                    y_i, _, _ = sv_func(op, rr, tol=inner_tol(rr),
                                        maxiter=maxiter, **sv_kwargs)
                    delta = delta + op.apply_m(y_i)
                    rr = r64.astype(sdtype) - A.mv(delta)
            else:
                As, unscale = pr_jacobi(A, None)
                for _ in range(max_pass):
                    d_i, _, _ = sv_func(As, rr, tol=inner_tol(rr),
                                        maxiter=maxiter, **sv_kwargs)
                    delta = delta + d_i
                    rr = r64.astype(sdtype) - As.mv(delta)
                delta = unscale(delta)
            dx = dx + beta[:, None] * (-delta.astype(f64))[None, :]
            r64b, K_nlb = residual_and_knl(dx)
            res2 = jnp.linalg.norm(r64b) / sqrt_n
            return dx, r64b, K_nlb, res2, res_in, it + 1

        big = jnp.asarray(np.finfo(np.float32).max, f64)
        dx, _, _, res, _, it = jax.lax.while_loop(
            cond, body, (dx0, r0, K0, res0, big, 0))
        return x + dx, dx, res, it

    return step
