"""Solver driver: restart passes with true-residual recomputation.

The analog of ``iterative_Solve!`` (02_Preconditioner.jl:30-78): build the
CSR values from the COO slots via the precomputed permutation, right-Jacobi
scale once, run <= max_pass batches of the chosen Krylov solver with the
true residual recomputed between passes, un-scale x at exit.  The direct
fallback (solver_LU_CPU / solver_LU_GPU, 01_Direct_Solver.jl) is a host
scipy splu — the reference itself notes direct host solves win for small
problems.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import krylov
from .precond import pl_jacobi, pr_jacobi
from .spmv import SparseMatrix


def solver_lu(A: SparseMatrix, b) -> jnp.ndarray:
    """Direct sparse LU on the host (01_Direct_Solver.jl:10-24)."""
    from scipy.sparse.linalg import splu
    lu = splu(A.to_scipy().tocsc())
    return jnp.asarray(lu.solve(np.asarray(b)))


def solver_qr(A: SparseMatrix, b, max_dense_n: int = 32768) -> jnp.ndarray:
    """Direct QR solve on the device (solver_QR_GPU,
    01_Direct_Solver.jl:55-66).

    The reference wraps cusolver's sparse QR; there is no sparse QR on
    TPU, so this densifies and runs ``jnp.linalg.qr`` on the MXU —
    exact for singular-pattern-free systems and robust on rank-marginal
    penalty rows where LU pivoting struggles.  Densification is O(n^2)
    memory, so it is gated at ``max_dense_n`` (4 GB f64 at the default);
    beyond that LSQR (krylov.lsqr) is the menu's least-squares path —
    the same role the reference assigns QR for ill-posed systems."""
    n = A.n
    if n > max_dense_n:
        raise ValueError(
            f"solver_qr densifies ({n} > max_dense_n={max_dense_n}); "
            "use krylov.lsqr for large least-squares-style solves")
    Ad = jnp.asarray(A.to_scipy().toarray(), b.dtype)
    q, r = jnp.linalg.qr(Ad)
    return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)


def iterative_solve(A: SparseMatrix, b, diag_pos: np.ndarray,
                    converge_tol: float = 1e-8,
                    sv_func: Callable = krylov.idrs,
                    use_pr_jacobi: bool = True,
                    use_pl_jacobi: bool = False,
                    neumann_order: int = 0,
                    max_pass: int = 4,
                    maxiter: int = 2000,
                    verbose: bool = False,
                    **kwargs) -> jnp.ndarray:
    """Preconditioned restarted Krylov solve of A x = b.

    ``neumann_order > 0`` enables the polynomial left preconditioner (the
    TPU substitute for the reference's ILU, see poly.py); it composes with
    the right Jacobi scaling and rescales b once."""
    unscale: Optional[Callable] = None
    if use_pr_jacobi:
        A, unscale = pr_jacobi(A, diag_pos)
    pl = pl_jacobi(A, diag_pos) if use_pl_jacobi else None
    if neumann_order > 0:
        from .poly import NeumannOperator
        dinv = pl_jacobi(A, diag_pos)
        A = NeumannOperator(A, dinv, neumann_order)
        b = A.pinv(b)
        pl = None

    n = b.shape[0]
    x = jnp.zeros_like(b)
    tol_factor = 1.0
    for pass_number in range(1, max_pass + 1):
        x, iters, _ = sv_func(A, b, x0=x, tol=tol_factor * converge_tol,
                              maxiter=maxiter, pl=pl, **kwargs)
        # true residual (Krylov updates r incrementally and drifts)
        r = b - A.mv(x)
        res = float(jnp.linalg.norm(r)) / np.sqrt(n)
        if pl is not None:
            pres = float(jnp.linalg.norm(pl * r)) / np.sqrt(n)
            tol_factor = min(pres / res, 1.0) if res > 0 else 1.0
        if verbose:
            print(f"  pass {pass_number}: res = {res:.3e} "
                  f"iters = {int(iters)}")
        if res < converge_tol:
            break
    return unscale(x) if unscale is not None else x
