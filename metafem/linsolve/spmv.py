"""Sparse matrix-vector products via gather + segment_sum.

Replaces the reference's CUSPARSE ``mv!``/``tmul!`` calls
(misc/04_GPU_Utils.jl:131-138).  The values are kept in CSR (row-major
sorted) order so the row segment_sum runs over sorted ids — the layout XLA
lowers most efficiently on TPU; the transpose product reuses the same
arrays with the roles of rows/cols swapped (unsorted segment ids, still
deterministic).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseMatrix:
    """Square sparse matrix in sorted-COO (= CSR order) form."""
    vals: jnp.ndarray          # [nnz] CSR-ordered values
    rows: jnp.ndarray          # [nnz] int32, sorted
    cols: jnp.ndarray          # [nnz] int32
    n: int                     # static

    def tree_flatten(self):
        return (self.vals, self.rows, self.cols), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x."""
        return jax.ops.segment_sum(self.vals * x[self.cols], self.rows,
                                   num_segments=self.n,
                                   indices_are_sorted=True)

    def tmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A.T @ x (needed by LSQR)."""
        return jax.ops.segment_sum(self.vals * x[self.rows], self.cols,
                                   num_segments=self.n)

    def diag(self, diag_pos: np.ndarray) -> jnp.ndarray:
        """Diagonal entries given their precomputed CSR positions
        (missing diagonals read as 0 via a guard gather)."""
        pos = jnp.asarray(np.where(diag_pos < 0, 0, diag_pos))
        d = self.vals[pos]
        return jnp.where(jnp.asarray(diag_pos) < 0, 0.0, d)

    def scale_cols(self, s: jnp.ndarray) -> "SparseMatrix":
        return SparseMatrix(self.vals * s[self.cols], self.rows, self.cols,
                            self.n)

    def scale_rows(self, s: jnp.ndarray) -> "SparseMatrix":
        return SparseMatrix(self.vals * s[self.rows], self.rows, self.cols,
                            self.n)

    def to_scipy(self):
        import scipy.sparse as sp
        return sp.csr_matrix(
            (np.asarray(self.vals),
             (np.asarray(self.rows), np.asarray(self.cols))),
            shape=(self.n, self.n))
