"""Row-sharded solver layout: K reduce-scattered onto row blocks,
Krylov vectors block-sharded, dots psum-reduced over the mesh.

The element-axis layout (dataparallel.py) replicates the assembled K —
an AllReduce of all nnz storage values per assembly, fine on one ICI
slice but the wrong asymptotic for many chips: every device pays the
full-matrix memory and the full-vector SpMV.  This module is the
scale-out refinement sketched there: the tangent storage and all solver
vectors are sharded along their leading (row/storage) axis over the same
``'el'`` mesh axis, so

* assembly's local partial sums land as a **ReduceScatter** onto the
  storage shards (XLA's GSPMD rewrites partial-sum + AllReduce + slice
  into reduce-scatter when the consumer demands a sharded layout);
* the block-offset SpMV computes each device's row block against the
  (gathered) x — the classic row-parallel SpMV;
* Krylov inner products become local dots + **psum** over the mesh —
  GSPMD inserts the collective from the sharding alone, riding ICI.

Nothing here hand-schedules a collective: the layout is declared with
``jax.lax.with_sharding_constraint`` at the three places that matter
(assembled K, residual, SpMV outputs) and XLA chooses the collective
schedule — the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe.

Used via ``make_jitted_step(..., rowshard_mesh=mesh)`` with a state
pytree placed by ``shard_domain_state`` (element tables sharded,
fields replicated).  Numerical identity with the single-device path is
asserted in tests/test_parallel.py; the driver's multichip dryrun
exercises it end-to-end.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def rowblock_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the LAST axis (rows of a vector, flat storage of K, or the
    trailing storage axis of the [L+1, n_storage] stacks) over 'el'."""
    return NamedSharding(mesh, P(*((None,) * (ndim - 1) + ("el",))))


def constrain(mesh: Optional[Mesh], v):
    """with_sharding_constraint to the row-block layout (no-op without
    a mesh, so call sites stay unconditional)."""
    if mesh is None or v is None:
        return v
    return jax.lax.with_sharding_constraint(
        v, rowblock_sharding(mesh, v.ndim))


@jax.tree_util.register_pytree_node_class
class RowShardedOp:
    """Wraps a SparseMatrix-like operator so every mv lands row-sharded:
    the only annotation the Krylov recurrences need — every axpy/dot
    downstream inherits the layout, and GSPMD turns the dots into
    local-dot + psum.  A pytree (mesh static) so jitted solver entry
    points accept it like the bare matrix."""

    def __init__(self, inner, mesh: Mesh):
        self.inner = inner
        self.mesh = mesh

    def tree_flatten(self):
        return (self.inner,), (self.mesh,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def mv(self, x):
        return constrain(self.mesh, self.inner.mv(x))

    def tmv(self, x):
        return constrain(self.mesh, self.inner.tmv(x))

    def diag(self, *a, **kw):
        return self.inner.diag(*a, **kw)

    @property
    def n(self):
        return self.inner.n
