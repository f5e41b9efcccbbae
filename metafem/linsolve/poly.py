"""Polynomial (truncated Neumann) left preconditioning.

The reference's strongest left preconditioner is ILU(0) via cusparse
(Pl_ILU, 02_Preconditioner.jl:179-193).  ILU's sequential triangular
solves are hostile to TPUs (no efficient sparse triangular solve without
level scheduling), so the documented substitution is a matrix-polynomial
preconditioner built from the Jacobi splitting:

    M^-1 = sum_{k=0..p} (I - D^-1 A)^k D^-1      (truncated Neumann)

Each application costs p SpMVs — all gathers/segment-sums at full
bandwidth — and composes with the right Jacobi scaling.  The solver sees
the left-preconditioned operator M^-1 A wrapped as a SparseMatrix-like
pytree, so every Krylov method works unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .spmv import SparseMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NeumannOperator:
    """Operator M^-1 A with M^-1 the order-p Neumann polynomial."""
    A: SparseMatrix
    dinv: jnp.ndarray
    order: int                      # static

    def tree_flatten(self):
        return (self.A, self.dinv), (self.order,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n(self) -> int:
        return self.A.n

    def pinv(self, v: jnp.ndarray) -> jnp.ndarray:
        """M^-1 v."""
        y = self.dinv * v
        acc = y
        for _ in range(self.order):
            y = y - self.dinv * self.A.mv(y)
            acc = acc + y
        return acc

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.pinv(self.A.mv(x))

    def tmv(self, x: jnp.ndarray) -> jnp.ndarray:
        # (M^-1 A)^T = A^T M^-T; M is symmetric only for symmetric A.
        # Provided for LSQR completeness on symmetric problems.
        y = x
        acc = y
        for _ in range(self.order):
            y = y - self.A.tmv(self.dinv * y)
            acc = acc + y
        return self.A.tmv(self.dinv * acc)
