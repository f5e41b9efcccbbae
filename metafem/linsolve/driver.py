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
