"""Matrix-free Krylov solvers as jitted ``lax.while_loop`` iterations.

The solver menu mirrors the reference's src/solver/linear_solver/
(03_BiCGstabl.jl, 04_IDRs.jl, 05_GMRES.jl, 06_LSQR.jl, 07_CGS.jl,
08_QMR.jl): CG, BiCGStab, BiCGStab(l), IDR(s), restarted GMRES, LSQR,
CGS, CGS2, TFQMR.  All share the signature

    solver(A: SparseMatrix, b, x0=None, tol=..., maxiter=..., pl=None)
        -> (x, iters, normalized_residual)

with ``tol`` on the normalized norm ||r|| / sqrt(n)
(04_Time_Domain.jl:51) and ``pl`` an optional left-preconditioner
*diagonal* (applied as diag(pl) A — Jacobi; the reference's Pl_ILU
triangular solves are hostile to TPU and are substituted by Jacobi /
right-scaling, see precond.py).  Small inner loops over the static s/l/
restart parameters are Python-unrolled at trace time (masked where the
reference uses dynamic slices) — XLA requires static shapes.

Numerical note: the reference insists on f64 for Krylov robustness
(misc/02_Global_Macros.jl:124); these run in whatever dtype the matrix
carries — f64 by default (jax_enable_x64), f32 possible on the TPU fast
path with Jacobi right-preconditioning absorbing most of the scale spread.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spmv import SparseMatrix


#: accumulation strategy for f32-vector dots: 'dot2' (compensated,
#: native-f32 VPU — the TPU default), 'f64' (emulated on TPU: measured
#: ~3-4 ms per 1.28M-element dot, ~60x slower than dot2), 'f32' (plain).
DOT_MODE = "dot2"


def _two_prod(a, b):
    """Error-free product a*b = p + err in f32 (twofloat.two_prod —
    Dekker splitting with the CPU-backend contraction pins; XLA:CPU's
    fused-kernel FMA contraction otherwise silently destroys the
    error term, see twofloat._pin)."""
    from .twofloat import two_prod
    return two_prod(a, b)


_BLOCK = 1024


def _block_sum(v):
    """f32 block sums + f64 reduction of the (tiny) block-sum vector:
    the emulated-f64 work is N/1024 elements, microseconds."""
    n = v.shape[0]
    m = -(-n // _BLOCK)
    vp = jnp.pad(v, (0, m * _BLOCK - n)).reshape(m, _BLOCK)
    return vp.sum(axis=1).astype(jnp.float64).sum()


def _dot(a, b):
    """Inner product with extended accumulation for f32 vectors: the
    Krylov recurrences break down at ~1e6 DOF when the dots cancel in
    f32 (the 'f32 storage + compensated reductions' strategy from the
    survey's precision plan).  Default is an Ogita-Rump-Oishi dot2
    variant: error-free elementwise products; products and their
    residual errors block-summed in f32 with an f64 tail — the hot work
    is all native-f32 VPU, no emulated f64 over full-length vectors
    (measured ~3-4 ms per 1.28M-element emulated-f64 dot on v5e)."""
    if a.dtype == jnp.float32:
        if DOT_MODE == "dot2":
            p, err = _two_prod(a, b)
            s = _block_sum(p) + _block_sum(err)
            return s.astype(jnp.float32)
        if DOT_MODE == "f64":
            return jnp.vdot(a.astype(jnp.float64),
                            b.astype(jnp.float64)).astype(jnp.float32)
        return jnp.vdot(a, b)
    return jnp.vdot(a, b)


def _norm(v):
    return jnp.sqrt(_dot(v, v))


def _nn(v):
    return _norm(v) / np.sqrt(v.shape[0])


def _pl(pl, v):
    return v if pl is None else pl * v


def _prep(A: SparseMatrix, b, x0, pl):
    x = jnp.zeros_like(b) if x0 is None else x0
    r = _pl(pl, b - A.mv(x))
    return x, r


def _modify_omega(t, r):
    """Omega angle stabilization (modify_Omega, 04_IDRs.jl:1-8)."""
    angle = float(np.sqrt(2.0) / 2.0)  # weak-typed: no f64 promotion
    tn, rn = _norm(t), _norm(r)
    tr = _dot(t, r)
    rho = jnp.abs(tr / jnp.where(tn * rn == 0, 1.0, tn * rn))
    omega = tr / jnp.where(tn == 0, 1.0, tn * tn)
    return jnp.where(rho < angle,
                     omega * angle / jnp.where(rho == 0, 1.0, rho), omega)


# ---------------------------------------------------------------------------
# CG (for SPD systems; not in the reference menu but cheap to provide)
# ---------------------------------------------------------------------------

@jax.jit
def cg(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    x, r = _prep(A, b, x0, pl)
    p = r
    rs = _dot(r, r)

    def cond(c):
        x, r, p, rs, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, p, rs, i = c
        Ap = _pl(pl, A.mv(p))
        alpha = rs / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = _dot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, i + 1

    x, r, _, _, iters = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
    return x, iters, _nn(r)


# ---------------------------------------------------------------------------
# Chebyshev (TPU addition — not in the reference menu)
# ---------------------------------------------------------------------------

def chebyshev(A: SparseMatrix, b, x0=None, tol=None, maxiter=8, pl=None,
              interval=(0.05, 1.95)):
    """Preconditioned Chebyshev iteration (Saad, Iterative Methods,
    Alg. 12.1) on a spectrum enclosure ``interval`` of A (pass the
    MG-composed operator: spectrum of A·M ⊂ [1-rho, 1+rho] where rho is
    the V-cycle contraction — multigrid.estimate_precond_rho).

    The TPU-native inner solver for SPD-preconditioned systems: ZERO
    inner products — each iteration is one operator apply plus two
    axpys, a fixed-trip fori_loop with no host-visible recurrence state.
    A Krylov method's dots serialize the pipeline every iteration and
    dominate once the matvec is fast; Chebyshev replaces adaptivity with
    an a-priori spectrum bound, and the caller (e.g. the refined Newton
    loop, jit_step.py) measures TRUE residuals outside, so a stale bound
    degrades the convergence RATE, never the answer.  ``tol`` is ignored
    (fixed trip count — pick ``maxiter`` from the bound:
    iters = ln(reduction) / ln(rho_cheb)); the signature matches the
    solver menu so it drops into every precond='mg'/'auxmg' path."""
    carry = chebyshev_init(A, b, x0=x0, pl=pl, interval=interval)
    x, r, _, _ = chebyshev_steps(A, carry, maxiter, interval, pl=pl)
    return x, jnp.asarray(maxiter, jnp.int32), _nn(r)


def chebyshev_init(A, b, x0=None, pl=None, interval=(0.05, 1.95)):
    """Initial (x, r, d, rho) recurrence carry for chebyshev_steps —
    split out so callers can bound per-dispatch work: a long Chebyshev
    solve in ONE dispatch can exceed what the remote-device transport
    tolerates (the TPU worker wedges on multi-minute dispatches), so
    e.g. multigrid.tune_chebyshev runs the trial solves as host-level
    chunks of chebyshev_steps, carrying this state across calls."""
    lo, hi = interval
    theta = jnp.asarray((hi + lo) / 2.0, b.dtype)
    sigma1 = theta / jnp.asarray((hi - lo) / 2.0, b.dtype)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = _pl(pl, b - A.mv(x)) if x0 is not None else _pl(pl, b)
    return x, r, r / theta, 1.0 / sigma1


def chebyshev_steps(A, carry, n, interval, pl=None):
    """Advance the Chebyshev recurrence ``n`` iterations; returns the
    carry (resumable: composing chunks reproduces one long solve)."""
    lo, hi = interval
    theta = jnp.asarray((hi + lo) / 2.0, carry[0].dtype)
    delta = jnp.asarray((hi - lo) / 2.0, carry[0].dtype)
    sigma1 = theta / delta

    def body(_, c):
        x, r, d, rho_prev = c
        x = x + d
        r = r - _pl(pl, A.mv(d))
        rho_k = 1.0 / (2.0 * sigma1 - rho_prev)
        d = (rho_k * rho_prev) * d + (2.0 * rho_k / delta) * r
        return x, r, d, rho_k

    return jax.lax.fori_loop(0, n, body, carry)


# ---------------------------------------------------------------------------
# BiCGStab / BiCGStab(l)
# ---------------------------------------------------------------------------

@jax.jit
def bicgstab(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    x, r = _prep(A, b, x0, pl)
    rt = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)

    def cond(c):
        x, r, p, v, rho, alpha, omega, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, p, v, rho, alpha, omega, i = c
        rho_new = _dot(rt, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = _pl(pl, A.mv(p))
        alpha = rho_new / _dot(rt, v)
        s = r - alpha * v
        t = _pl(pl, A.mv(s))
        omega = _dot(t, s) / _dot(t, t)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return x, r, p, v, rho_new, alpha, omega, i + 1

    x, r, *_, iters = jax.lax.while_loop(
        cond, body, (x, r, p, v, rho, alpha, omega, 0))
    return x, iters, _nn(r)


@partial(jax.jit, static_argnames=("s",))
def bicgstabl(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None,
              s: int = 2):
    """BiCGStab(l) with l = s stages (03_BiCGstabl.jl); the minimal-residual
    polynomial part solves the small normal equations on the Gram matrix
    (the reference offers Gram-Schmidt and LU variants; equivalent in exact
    arithmetic at small l)."""
    l = s
    x, r0 = _prep(A, b, x0, pl)
    rt = r0
    u0 = jnp.zeros_like(b)
    rho0 = jnp.asarray(1.0, b.dtype)
    alpha = jnp.asarray(0.0, b.dtype)
    omega = jnp.asarray(1.0, b.dtype)

    def cond(c):
        x, r0, u0, rho0, alpha, omega, i = c
        return (_nn(r0) > tol) & (i < maxiter)

    def body(c):
        x, r0, u0, rho0, alpha, omega, i = c
        rho0 = -omega * rho0
        rs = [r0] + [jnp.zeros_like(b) for _ in range(l)]
        us = [u0] + [jnp.zeros_like(b) for _ in range(l)]
        for j in range(l):  # BiCG part
            rho1 = _dot(rt, rs[j])
            beta = alpha * rho1 / rho0
            rho0 = rho1
            for k in range(j + 1):
                us[k] = rs[k] - beta * us[k]
            us[j + 1] = _pl(pl, A.mv(us[j]))
            gamma = _dot(rt, us[j + 1])
            alpha = rho0 / gamma
            for k in range(j + 1):
                rs[k] = rs[k] - alpha * us[k + 1]
            rs[j + 1] = _pl(pl, A.mv(rs[j]))
            x = x + alpha * us[0]
        # MR part: minimize || rs[0] - sum_j gamma_j rs[j] ||
        Z = jnp.stack([jnp.stack([_dot(rs[i_], rs[j_])
                                  for j_ in range(1, l + 1)])
                       for i_ in range(1, l + 1)])
        z0 = jnp.stack([_dot(rs[0], rs[j_]) for j_ in range(1, l + 1)])
        gam = jnp.linalg.solve(Z, z0)
        omega = gam[l - 1]
        u0_, r0_, x_ = us[0], rs[0], x
        for j in range(1, l + 1):
            u0_ = u0_ - gam[j - 1] * us[j]
            x_ = x_ + gam[j - 1] * rs[j - 1]
            r0_ = r0_ - gam[j - 1] * rs[j]
        return x_, r0_, u0_, rho0, alpha, omega, i + l

    x, r0, *_, iters = jax.lax.while_loop(
        cond, body, (x, r0, u0, rho0, alpha, omega, 0))
    return x, iters, _nn(r0)


@partial(jax.jit, static_argnames=("s",))
def bicgstabl_gs(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000,
                 pl=None, s: int = 2):
    """BiCGStab(l) with the minimal-residual part solved by modified
    Gram-Schmidt orthogonalization (Sleijpen-Fokkema 1993, Alg. 3.1) —
    the reference ships this as ``bicgstabl_GS!`` and recommends it over
    the LU/normal-equations MR part for stability (03_BiCGstabl.jl:16):
    MGS works on the residual vectors directly instead of the Gram
    matrix, whose conditioning is squared."""
    l = s
    x, r0 = _prep(A, b, x0, pl)
    rt = r0
    u0 = jnp.zeros_like(b)
    rho0 = jnp.asarray(1.0, b.dtype)
    alpha = jnp.asarray(0.0, b.dtype)
    omega = jnp.asarray(1.0, b.dtype)

    def cond(c):
        x, r0, u0, rho0, alpha, omega, i = c
        return (_nn(r0) > tol) & (i < maxiter)

    def body(c):
        x, r0, u0, rho0, alpha, omega, i = c
        rho0 = -omega * rho0
        rs = [r0] + [jnp.zeros_like(b) for _ in range(l)]
        us = [u0] + [jnp.zeros_like(b) for _ in range(l)]
        for j in range(l):  # BiCG part (same as bicgstabl)
            rho1 = _dot(rt, rs[j])
            beta = alpha * rho1 / rho0
            rho0 = rho1
            for k in range(j + 1):
                us[k] = rs[k] - beta * us[k]
            us[j + 1] = _pl(pl, A.mv(us[j]))
            gamma = _dot(rt, us[j + 1])
            alpha = rho0 / gamma
            for k in range(j + 1):
                rs[k] = rs[k] - alpha * us[k + 1]
            rs[j + 1] = _pl(pl, A.mv(rs[j]))
            x = x + alpha * us[0]
        # MR part by MGS: orthogonalize rs[1..l] in place, tracking the
        # projection coefficients tau and the plane sizes sigma
        tau = [[None] * (l + 1) for _ in range(l + 1)]
        sigma = [None] * (l + 1)
        gamma_p = [None] * (l + 1)
        for j in range(1, l + 1):
            for i_ in range(1, j):
                tij = _dot(rs[j], rs[i_]) / sigma[i_]
                tau[i_][j] = tij
                rs[j] = rs[j] - tij * rs[i_]
            sigma[j] = _dot(rs[j], rs[j])
            gamma_p[j] = _dot(rs[0], rs[j]) / sigma[j]
        gam = [None] * (l + 1)
        gam[l] = gamma_p[l]
        omega = gam[l]
        for j in range(l - 1, 0, -1):
            gam[j] = gamma_p[j] - sum(
                (tau[j][i_] * gam[i_] for i_ in range(j + 1, l + 1)),
                jnp.asarray(0.0, b.dtype))
        gam_pp = [None] * l
        for j in range(1, l):
            gam_pp[j] = gam[j + 1] + sum(
                (tau[j][i_] * gam[i_ + 1] for i_ in range(j + 1, l)),
                jnp.asarray(0.0, b.dtype))
        x = x + gam[1] * rs[0]
        rs[0] = rs[0] - gamma_p[l] * rs[l]
        us[0] = us[0] - gam[l] * us[l]
        for j in range(1, l):
            us[0] = us[0] - gam[j] * us[j]
            x = x + gam_pp[j] * rs[j]
            rs[0] = rs[0] - gamma_p[j] * rs[j]
        return x, rs[0], us[0], rho0, alpha, omega, i + l

    x, r0, *_, iters = jax.lax.while_loop(
        cond, body, (x, r0, u0, rho0, alpha, omega, 0))
    return x, iters, _nn(r0)


# ---------------------------------------------------------------------------
# IDR(s) — biortho variant (04_IDRs.jl idrs!)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("s",))
def idrs(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None,
         s: int = 4):
    x, r = _prep(A, b, x0, pl)
    n = b.shape[0]
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (s, n), dtype=b.dtype)   # shadow space rows
    G = jnp.zeros((s, n), b.dtype)
    U = jnp.zeros((s, n), b.dtype)
    M = jnp.eye(s, dtype=b.dtype)
    omega = jnp.asarray(1.0, b.dtype)
    idx = np.arange(s)

    def cond(c):
        x, r, G, U, M, omega, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, G, U, M, omega, i = c
        f = P @ r                                        # [s]
        for k in range(s):
            # solve the masked lower-triangular M[k:, k:] c = f[k:]
            mask = jnp.asarray((idx[:, None] >= k) & (idx[None, :] >= k))
            Mk = jnp.where(mask, M, jnp.eye(s, dtype=b.dtype))
            Mk = jnp.where(jnp.asarray(idx[:, None] >= idx[None, :]), Mk, 0.0)
            fk = jnp.where(jnp.asarray(idx >= k), f, 0.0)
            cvec = jax.scipy.linalg.solve_triangular(Mk, fk, lower=True)
            v = r - (cvec[:, None] * G).sum(0)
            q = (cvec[:, None] * U).sum(0)
            u_k = q + omega * v
            g_k = _pl(pl, A.mv(u_k))
            for i2 in range(k):  # biorthogonalize against P[:k]
                alpha = _dot(P[i2], g_k) / M[i2, i2]
                g_k = g_k - alpha * G[i2]
                u_k = u_k - alpha * U[i2]
            G = G.at[k].set(g_k)
            U = U.at[k].set(u_k)
            Mcol = P @ g_k                               # [s]
            M = M.at[:, k].set(jnp.where(jnp.asarray(idx >= k), Mcol,
                                         M[:, k]))
            beta = f[k] / M[k, k]
            r = r - beta * g_k
            x = x + beta * u_k
            f = jnp.where(jnp.asarray(idx > k), f - beta * Mcol, f)
        # entering G_{j+1}
        v = r
        t = _pl(pl, A.mv(v))
        omega = _modify_omega(t, r)
        x = x + omega * v
        r = r - omega * t
        return x, r, G, U, M, omega, i + s + 1

    x, r, *_, iters = jax.lax.while_loop(
        cond, body, (x, r, G, U, M, omega, 0))
    return x, iters, _nn(r)


@partial(jax.jit, static_argnames=("s",))
def idrs_original(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000,
                  pl=None, s: int = 4):
    """IDR(s), original (non-biorthogonalized) variant: the Sonneveld &
    van Gijzen 2008 prototype with direct s-by-s ``M c = f`` solves
    against the full shadow matrix, instead of the incremental
    orthogonalization ``idrs`` exploits.  Parity counterpart of the
    reference's second IDR variant ``idrs_original!``
    (src/solver/linear_solver/04_IDRs.jl:97-166); independent JAX
    implementation of the published algorithm (while_loop state
    threading; the residual recurrence follows the paper — each cycle's
    omega step updates r = v - omega*t so r stays b - Ax exactly).
    """
    x, r = _prep(A, b, x0, pl)
    n = b.shape[0]
    P = jax.random.normal(jax.random.PRNGKey(0), (s, n), dtype=b.dtype)
    U = jnp.zeros((s, n), b.dtype)
    G = jnp.zeros((s, n), b.dtype)
    M = jnp.zeros((s, s), b.dtype)
    omega = jnp.asarray(1.0, b.dtype)

    # initial space: s smoothed power steps fill U, G = A U, M = P G'
    def init_k(k, c):
        x, r, U, G, M, omega = c
        u = r
        g = _pl(pl, A.mv(r))
        omega = _modify_omega(g, r)
        x = x + omega * u
        r = r - omega * g
        U = U.at[k].set(u)
        G = G.at[k].set(g)
        M = M.at[:, k].set(P @ g)
        return x, r, U, G, M, omega

    x, r, U, G, M, omega = jax.lax.fori_loop(
        0, s, init_k, (x, r, U, G, M, omega))

    def cond(c):
        x, r, U, G, M, omega, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, U, G, M, omega, i = c
        # k = 0: step into G_{j+1}, refresh omega
        f = P @ r
        cvec = jnp.linalg.solve(M, f)
        v = r - cvec @ G
        q = cvec @ U
        t = _pl(pl, A.mv(v))
        omega = _modify_omega(t, v)
        x = x + q + omega * v
        r = v - omega * t
        # k = 1..s: rebuild the s directions inside G_{j+1}
        for k in range(s):
            f = P @ r
            cvec = jnp.linalg.solve(M, f)
            v = r - cvec @ G
            u_k = cvec @ U + omega * v
            g_k = _pl(pl, A.mv(u_k))
            x = x + u_k
            r = r - g_k
            U = U.at[k].set(u_k)
            G = G.at[k].set(g_k)
            M = M.at[:, k].set(P @ g_k)
        return x, r, U, G, M, omega, i + s + 1

    x, r, *_, iters = jax.lax.while_loop(
        cond, body, (x, r, U, G, M, omega, 0))
    return x, iters, _nn(r)


# ---------------------------------------------------------------------------
# restarted GMRES (05_GMRES.jl)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("s",))
def gmres(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None,
          s: int = 20):
    restart = s
    x, r = _prep(A, b, x0, pl)
    n = b.shape[0]
    del r

    def cycle(x):
        r = _pl(pl, b - A.mv(x))
        beta = _norm(r)
        V = jnp.zeros((restart + 1, n), b.dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((restart + 1, restart), b.dtype)
        for j in range(restart):        # static Arnoldi, trace-unrolled
            w = _pl(pl, A.mv(V[j]))
            hcol = V @ w                # rows > j multiply ~zero vectors
            mask = jnp.asarray(np.arange(restart + 1) <= j)
            hcol = jnp.where(mask, hcol, 0.0)
            w = w - (hcol[:, None] * V).sum(0)
            hnorm = _norm(w)
            H = H.at[:, j].set(hcol)
            H = H.at[j + 1, j].set(hnorm)
            V = V.at[j + 1].set(w / jnp.where(hnorm == 0, 1.0, hnorm))
        # Givens-rotation QR of the Hessenberg (05_GMRES.jl:7-37): one
        # rotation per column eliminates the subdiagonal; |g[restart]| is
        # the residual-norm estimate.  (Normal equations would square the
        # conditioning — fatal in the f32 hot path at kappa ~ 1e6.)
        R = H
        g = jnp.zeros(restart + 1, b.dtype).at[0].set(beta)
        for j in range(restart):
            a, c_ = R[j, j], R[j + 1, j]
            denom = jnp.sqrt(a * a + c_ * c_)
            safe = jnp.where(denom == 0, 1.0, denom)
            cs = jnp.where(denom == 0, 1.0, a / safe)
            sn = jnp.where(denom == 0, 0.0, c_ / safe)
            row_j = cs * R[j] + sn * R[j + 1]
            row_j1 = cs * R[j + 1] - sn * R[j]
            R = R.at[j].set(row_j).at[j + 1].set(row_j1)
            gj = cs * g[j] + sn * g[j + 1]
            gj1 = cs * g[j + 1] - sn * g[j]
            g = g.at[j].set(gj).at[j + 1].set(gj1)
        Rd = jnp.where(jnp.abs(jnp.diag(R[:restart])) == 0,
                       1.0, jnp.diag(R[:restart]))
        Ru = (R[:restart, :restart]
              * (1.0 - jnp.eye(restart, dtype=b.dtype))
              + jnp.diag(Rd))
        y = jax.scipy.linalg.solve_triangular(Ru, g[:restart], lower=False)
        return x + y @ V[:restart]

    def cond(c):
        x, i = c
        return (_nn(_pl(pl, b - A.mv(x))) > tol) & (i < maxiter)

    def body(c):
        x, i = c
        return cycle(x), i + restart

    x, iters = jax.lax.while_loop(cond, body, (x, 0))
    r = _pl(pl, b - A.mv(x))
    return x, iters, _nn(r)


# ---------------------------------------------------------------------------
# LSQR (06_LSQR.jl) — Golub-Kahan; most robust, needs A^T x
# ---------------------------------------------------------------------------

@jax.jit
def lsqr(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    del pl  # LSQR runs unpreconditioned (matches the reference)
    x = jnp.zeros_like(b) if x0 is None else x0
    u = b - A.mv(x)
    beta = _norm(u)
    u = u / jnp.where(beta == 0, 1.0, beta)
    v = A.tmv(u)
    alpha = _norm(v)
    v = v / jnp.where(alpha == 0, 1.0, alpha)
    w = v
    phibar, rhobar = beta, alpha

    def cond(c):
        x, u, v, w, alpha, beta, phibar, rhobar, i = c
        return (phibar / np.sqrt(b.shape[0]) > tol) & (i < maxiter)

    def body(c):
        x, u, v, w, alpha, beta, phibar, rhobar, i = c
        u = A.mv(v) - alpha * u
        beta = _norm(u)
        u = u / jnp.where(beta == 0, 1.0, beta)
        v = A.tmv(u) - beta * v
        alpha = _norm(v)
        v = v / jnp.where(alpha == 0, 1.0, alpha)
        rho = jnp.sqrt(rhobar ** 2 + beta ** 2)
        c_ = rhobar / rho
        s_ = beta / rho
        theta = s_ * alpha
        rhobar = -c_ * alpha
        phi = c_ * phibar
        phibar = s_ * phibar
        x = x + (phi / rho) * w
        w = v - (theta / rho) * w
        return x, u, v, w, alpha, beta, phibar, rhobar, i + 1

    x, *_, iters = jax.lax.while_loop(
        cond, body, (x, u, v, w, alpha, beta, phibar, rhobar, 0))
    r = b - A.mv(x)
    return x, iters, _nn(r)


# ---------------------------------------------------------------------------
# CGS / CGS2 (07_CGS.jl) — recurrences mirror the reference's variants
# ---------------------------------------------------------------------------

@jax.jit
def cgs(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    x, r = _prep(A, b, x0, pl)
    r0 = r
    one = jnp.asarray(1.0, b.dtype)
    u = p = jnp.zeros_like(b)

    def cond(c):
        x, r, u, p, rho, alpha, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, u, p, rho, alpha, i = c
        rhobar = rho
        rho = _dot(r, r0)
        beta = rho / rhobar
        s_ = r + beta * p
        u = s_ + beta * (p + beta * u)
        v = _pl(pl, A.mv(u))
        alpha = rho / _dot(v, r0)
        p = s_ - alpha * v
        x = x + alpha * (p + s_)
        r = _pl(pl, b - A.mv(x))
        return x, r, u, p, rho, alpha, i + 1

    x, r, *_, iters = jax.lax.while_loop(
        cond, body, (x, r, u, p, one, one, 0))
    return x, iters, _nn(r)


@jax.jit
def cgs2(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    x, r = _prep(A, b, x0, pl)
    r0 = r
    s0 = jax.random.normal(jax.random.PRNGKey(1), b.shape, b.dtype)
    one = jnp.asarray(1.0, b.dtype)
    z = jnp.zeros_like(b)

    def cond(c):
        x, r, u, w, s_, scal, i = c
        return (_nn(r) > tol) & (i < maxiter)

    def body(c):
        x, r, u, w, s_, (alpha, alphabar, sigma, sigmabar), i = c
        rho = _dot(r, r0)
        beta = (1.0 / alphabar) * rho / sigma
        v = r + beta * u
        rhobar = _dot(r, s0)
        betabar = (1.0 / alpha) * rhobar / sigmabar
        t = r + betabar * s_
        w = t + beta * (u + betabar * w)
        cv = _pl(pl, A.mv(w))
        sigma = _dot(cv, r0)
        alpha = rho / sigma
        s_ = t - alpha * cv
        sigmabar = _dot(cv, s0)
        alphabar = rhobar / sigmabar
        u = v - alphabar * cv
        x = x + alpha * v + alphabar * s_
        r = _pl(pl, b - A.mv(x))
        return x, r, u, w, s_, (alpha, alphabar, sigma, sigmabar), i + 1

    x, r, *_, iters = jax.lax.while_loop(
        cond, body, (x, r, z, z, z, (one, one, one, one), 0))
    return x, iters, _nn(r)


# ---------------------------------------------------------------------------
# TFQMR (08_QMR.jl) — transpose-free QMR (Freund)
# ---------------------------------------------------------------------------

@jax.jit
def tfqmr(A: SparseMatrix, b, x0=None, tol=1e-8, maxiter=1000, pl=None):
    """CGS-recurrence TFQMR (QMR smoothing of CGS, Freund 1993) — the same
    variant the reference implements.  The shadow residual is randomized to
    avoid the exact Lanczos breakdown that r0* = r0 produces on symmetric
    systems; tau is the (slightly over-estimating) quasi-residual bound
    used for the stop test, with the true residual returned at exit."""
    x, r = _prep(A, b, x0, pl)
    key = jax.random.PRNGKey(2)
    r0 = r + 0.1 * _norm(r) * jax.random.normal(key, b.shape, b.dtype)
    r_cgs = r
    p = u = r
    v = _pl(pl, A.mv(p))
    d = jnp.zeros_like(b)
    tau = _norm(r)
    r_norm = tau
    rho = _dot(r, r0)
    theta = eta = jnp.asarray(0.0, b.dtype)

    def cond(c):
        x, r_cgs, p, u, v, d, tau, r_norm, rho, theta, eta, i = c
        return (tau / np.sqrt(b.shape[0]) > tol) & (i < maxiter)

    def body(c):
        x, r_cgs, p, u, v, d, tau, r_norm, rho, theta, eta, i = c
        alpha = rho / _dot(v, r0)
        q = u - alpha * v
        w = u + q
        r_cgs = r_cgs - alpha * _pl(pl, A.mv(w))
        r_norm_old = r_norm
        r_norm = _norm(r_cgs)
        # two QMR-smoothed half updates
        d = u + (theta ** 2 * eta / alpha) * d
        theta = r_norm_old / tau
        cf = 1.0 / jnp.sqrt(1.0 + theta ** 2)
        tau = tau * theta * cf
        eta = cf ** 2 * alpha
        x = x + eta * d
        d = q + (theta ** 2 * eta / alpha) * d
        theta = jnp.sqrt(r_norm * r_norm_old) / tau
        cf = 1.0 / jnp.sqrt(1.0 + theta ** 2)
        tau = tau * theta * cf
        eta = cf ** 2 * alpha
        x = x + eta * d
        rho_new = _dot(r_cgs, r0)
        beta = rho_new / rho
        u = r_cgs + beta * q
        p = u + beta * (q + beta * p)
        v = _pl(pl, A.mv(p))
        return (x, r_cgs, p, u, v, d, tau, r_norm, rho_new, theta, eta,
                i + 1)

    x, *_, iters = jax.lax.while_loop(
        cond, body, (x, r_cgs, p, u, v, d, tau, r_norm, rho, theta, eta, 0))
    r = _pl(pl, b - A.mv(x))
    return x, iters, _nn(r)
