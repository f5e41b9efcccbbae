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


def _row_axes(mesh: Mesh):
    """The mesh axes a row block splits over.  1-D meshes: the 'el'
    axis.  Multi-axis meshes (e.g. a nested ('slice', 'el') DCN x ICI
    layout — PERFORMANCE.md round-5 design note): ALL axes, flattened
    into one 1-D domain decomposition whose outer blocks align with the
    leading (slower, e.g. DCN) axis — only band-boundary halos and
    1-scalar psum combines cross the slow axis."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[-1]


def rowblock_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the LAST axis (rows of a vector, flat storage of K, or the
    trailing storage axis of the [L+1, n_storage] stacks) over the
    mesh's row axes."""
    return NamedSharding(mesh, P(*((None,) * (ndim - 1)
                                   + (_row_axes(mesh),))))


def lattice_sharding(mesh: Mesh, ndim: int, lead: int = 1) -> NamedSharding:
    """Shard the FIRST spatial axis of a lattice-shaped array over the
    row axes (``lead`` leading channel axes stay replicated): [C, *S]
    smoother diagonals, [C, C, *S] channel blocks, [1, *S] masks.  A
    1-D domain decomposition of the lattice — the stencil smoother's
    pad+static-slice shifts become GSPMD halo exchanges over the mesh
    axes."""
    spec = (None,) * lead + (_row_axes(mesh),) + (None,) * (ndim - lead - 1)
    return NamedSharding(mesh, P(*spec))


def constrain(mesh: Optional[Mesh], v):
    """with_sharding_constraint to the row-block layout (no-op without
    a mesh, so call sites stay unconditional)."""
    if mesh is None or v is None:
        return v
    return jax.lax.with_sharding_constraint(
        v, rowblock_sharding(mesh, v.ndim))


def put_divisible(v, sharding: NamedSharding, mesh: Mesh):
    """device_put with the given sharding when every sharded axis size
    divides the mesh extent; replicate otherwise.  Uneven shardings are
    a hard error in device_put and are silently DROPPED (replicated) by
    with_sharding_constraint in current JAX, so callers that want the
    split must make sizes divisible first — structured domains do so
    via ``mesh_classical(lattice_pad=n_devices)``."""
    spec = sharding.spec
    n_dev = mesh.devices.size
    for axis, name in enumerate(spec):
        if name is not None and v.shape[axis] % n_dev != 0:
            return jax.device_put(v, NamedSharding(mesh, P()))
    return jax.device_put(v, sharding)


def shard_mg_state(mg_state, mesh: Mesh):
    """Place a frozen multigrid state tuple (multigrid.mg_setup) onto the
    device mesh: the FINE level's arrays are sharded — the assembled
    operator's storage row-blocked over 'el', the smoother diagonal /
    channel blocks / occupancy mask split along the first lattice axis —
    while the coarser (Galerkin) levels stay replicated: level 1 is
    already 2^dim x smaller and the V-cycle spends ~90% of its time in
    the fine smoother, so sharding only level 0 captures the memory and
    bandwidth win without fragmenting the tiny coarse stencils.  Arrays
    whose split axis does not divide the mesh fall back to replication
    (see put_divisible; build the domain with lattice_pad=n_devices to
    guarantee the split)."""
    if mg_state is None:
        return None
    rep = NamedSharding(mesh, P())
    out = []
    for level, entry in enumerate(mg_state):
        e = {}
        for k, v in entry.items():
            if level == 0 and k == "A":
                e[k] = jax.tree_util.tree_map(
                    lambda a: put_divisible(
                        a, rowblock_sharding(mesh, a.ndim), mesh), v)
            elif level == 0 and k in ("inv_diag", "mask"):
                e[k] = put_divisible(
                    v, lattice_sharding(mesh, v.ndim, 1), mesh)
            elif level == 0 and k == "inv_diag_blk":
                e[k] = put_divisible(
                    v, lattice_sharding(mesh, v.ndim, 2), mesh)
            else:
                e[k] = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, rep), v)
        out.append(e)
    return tuple(out)


@jax.tree_util.register_pytree_node_class
class RowShardedMGOperator:
    """MG-preconditioned operator (multigrid.MGOperator: A ∘ M) whose
    products land row-sharded.  Constraining the two operator outputs is
    the only annotation the Krylov/Chebyshev recurrences need: every
    axpy/dot downstream inherits the layout (dots become local-dot +
    psum), and GSPMD propagates the sharding back INTO the V-cycle —
    the fine-level stencil smoother's pad+slice shifts lower to halo
    exchanges instead of gathers.  Coarse-level work may be resharded
    or replicated by XLA; those arrays are tiny by construction."""

    def __init__(self, op, mesh: Mesh):
        self.op = op
        self.mesh = mesh

    def tree_flatten(self):
        return (self.op,), (self.mesh,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def mv(self, v):
        return constrain(self.mesh, self.op.mv(v))

    def apply_m(self, y):
        return constrain(self.mesh, self.op.apply_m(y))


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
