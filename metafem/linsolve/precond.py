"""Preconditioners (02_Preconditioner.jl).

Right Jacobi (the reference's recommended default, Pr_Jacobi!,
02_Preconditioner.jl:103-148): scale columns once by the diagonal (falling
back to the column norm when a diagonal entry vanishes), un-scale x at
exit.  Left Jacobi similarly by rows.  The reference's Pl_ILU has no
TPU-friendly equivalent (sequential triangular solves are hostile to wide
SIMD); a truncated-Neumann/Jacobi-smoothed variant is the documented
substitution and covered by the left-Jacobi path here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spmv import SparseMatrix


def _col_norms(A: SparseMatrix) -> jnp.ndarray:
    return jnp.sqrt(jax.ops.segment_sum(A.vals * A.vals, A.cols,
                                        num_segments=A.n))


def _row_norms(A: SparseMatrix) -> jnp.ndarray:
    return jnp.sqrt(jax.ops.segment_sum(A.vals * A.vals, A.rows,
                                        num_segments=A.n,
                                        indices_are_sorted=True))


def pr_jacobi(A, diag_pos: np.ndarray = None) -> Tuple[object, Callable]:
    """Right Jacobi: returns (scaled A, unscale) with A' = A diag(s),
    x = diag(s) x'.  Scales by the SIGNED diagonal (column norm / 1.0
    fallback for zero diagonals), so the scaled diagonal is exactly +1 —
    sign-mixed diagonals (e.g. -k-Laplacian rows next to +1 ghost rows)
    would otherwise make the scaled system indefinite and break the
    Krylov iterations (matches Pr_Jacobi!, 02_Preconditioner.jl:103-148,
    which divides by the diagonal element, sign included)."""
    d = A.diag(diag_pos)
    if hasattr(A, "cols"):
        fallback = _col_norms(A)
        d = jnp.where(d != 0, d, jnp.where(fallback > 0, fallback, 1.0))
    else:
        d = jnp.where(d != 0, d, 1.0)
    s = 1.0 / d
    return A.scale_cols(s), lambda x: s * x


def pl_jacobi(A, diag_pos: np.ndarray = None) -> jnp.ndarray:
    """Left Jacobi diagonal: M^-1 v = s * v (row-norm fallback for zero
    diagonals); returned as the vector s consumed by krylov's ``pl``."""
    d = A.diag(diag_pos)
    if hasattr(A, "rows"):
        fallback = _row_norms(A)
        d = jnp.where(d != 0, d, jnp.where(fallback > 0, fallback, 1.0))
    else:
        d = jnp.where(d != 0, d, 1.0)
    return 1.0 / d


@dataclasses.dataclass(frozen=True)
class Identity:
    def __call__(self, v):
        return v
