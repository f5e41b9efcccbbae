"""Element-axis data parallelism (SPMD over a device mesh).

Design (the TPU replacement for the reference's absent distributed layer,
SURVEY §2.8): the FEM "sequence" is the element list — embarrassingly
parallel for the gather/coefficient/contract stages.  Every per-element
table (physical derivative tables, weights, cp ids, sparse slots) is
sharded along the leading element axis with ``NamedSharding(P('el'))``;
the global vectors (x, K values, residual) and per-controlpoint fields
stay replicated.  Under jit, GSPMD partitions the batched einsums
per-device and lowers each ``segment_sum`` into local partial sums plus an
AllReduce over the mesh — exactly the halo-free "psum of partial
assemblies" pattern, riding ICI.

Padding: the element count is padded to a multiple of the mesh size; pad
elements carry zero derivative tables and zero quadrature weights, so
every contribution they scatter is exactly 0 (slot 0 receives +0.0 —
bitwise no-op in f32/f64).

Scaling note (multi-slice / >16 chips): replicated K forces an AllReduce
of nnz values.  The scale-out refinement lives in rowshard.py — K
reduce-scattered onto row-block shards, Krylov vectors sharded, dots
psum'd — enabled per step with ``make_jitted_step(rowshard_mesh=mesh)``.
On one slice the AllReduce rides ICI and the element axis dominates, so
this replicated layout stays the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def element_sharding(mesh: Mesh) -> NamedSharding:
    from .rowshard import _row_axes
    return NamedSharding(mesh, P(_row_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("el",))


def _pad_leading(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    pad_block = jnp.zeros((pad,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


def shard_domain_state(state: dict, mesh: Mesh) -> dict:
    """Place a FEM_Domain runtime state pytree onto the device mesh:
    element tables sharded along 'el', everything else replicated."""
    n_dev = mesh.devices.size
    el_sh = element_sharding(mesh)
    rep = replicated_sharding(mesh)

    def _shard_part(part: dict, shard: bool) -> dict:
        if not shard:
            return {k: jax.device_put(v, rep) for k, v in part.items()}
        if part.get("itg_vals") is None or part.get("weights") is None:
            raise RuntimeError(
                "shard_domain_state: the volume element tables were "
                "released by free_volume_tables(); call update_mesh() "
                "to rebuild them before sharding")
        out = {k: jax.device_put(_pad_leading(v, n_dev), el_sh)
               for k, v in part.items()}
        # pad elements must contribute exactly zero: zero their tables
        n_real = part["weights"].shape[0]
        for key in ("weights", "itg_vals"):
            v = out[key]
            mask = (jnp.arange(v.shape[0]) < n_real).astype(v.dtype)
            out[key] = v * mask.reshape((-1,) + (1,) * (v.ndim - 1))
        return out

    out = dict(state)
    # volume element batches get padded to the mesh, so their precomputed
    # reduction maps (sized to the unpadded streams) are invalid — drop
    # them and the updaters rebuild padded maps at trace time.  The
    # refined-step nonaffine phases are the exception: they run on the
    # frozen REPLICATED wp tables (state['refined']), so their maps stay
    # valid and the compact-residual / df reductions require them.
    refined_phases = ("nonaff_res", "nonaff_nl", "nonaff_res_df")
    maps = state.get("maps") or {}
    out["maps"] = {
        ph: jax.tree_util.tree_map(
            lambda v: jax.device_put(jnp.asarray(v), rep), maps[ph])
        for ph in refined_phases if ph in maps}
    wps = []
    for wp_state in state["wp"]:
        # boundary facet batches are typically small; keep them replicated
        # (they also partition by local-face index, so per-part sharding
        # would fragment the mesh axis)
        wps.append({
            "el": _shard_part(wp_state["el"], shard=True),
            "bdy": {bg: [_shard_part(p, shard=False) for p in parts]
                    for bg, parts in wp_state["bdy"].items()},
            "fields": {k: jax.device_put(v, rep)
                       for k, v in wp_state["fields"].items()},
        })
    out["wp"] = wps
    for k in ("x_star", "K_linear", "K_params"):
        out[k] = jax.device_put(state[k], rep)
    if state.get("ghost_diag") is not None:
        out["ghost_diag"] = jax.device_put(state["ghost_diag"], rep)
    if "user" in state:
        out["user"] = jax.tree_util.tree_map(
            lambda v: jax.device_put(jnp.asarray(v), rep), state["user"])
    # frozen cross-step caches: every committed leaf must land on the
    # mesh or pjit rejects the mixed-device state.  The MG state gets
    # its fine level sharded (rowshard.shard_mg_state); the per-td
    # linear-tangent stack row-blocks its storage axis (it is combined
    # into the already-constrained K_linear); the rest replicates.
    if state.get("mg_frozen") is not None:
        from .rowshard import shard_mg_state
        out["mg_frozen"] = shard_mg_state(state["mg_frozen"], mesh)
    if state.get("K_linear_td") is not None:
        from .rowshard import put_divisible, rowblock_sharding
        out["K_linear_td"] = put_divisible(
            state["K_linear_td"], rowblock_sharding(mesh, 2), mesh)
    if state.get("refined") is not None:
        # the frozen refined operator: A_td stacks [L+1, n_storage] and
        # the b/residual vectors [n] row-block over the mesh's row axes
        # (their SpMVs / axpys then land sharded in the refined step);
        # boundary tables, DF geometry and index arrays replicate
        from .rowshard import put_divisible, rowblock_sharding
        ref = dict(state["refined"])
        for k in ("A_hi", "A_lo"):
            if ref.get(k) is not None:
                ref[k] = put_divisible(
                    ref[k], rowblock_sharding(mesh, 2), mesh)
        for k in ("b_hi", "b_lo"):
            if ref.get(k) is not None:
                ref[k] = put_divisible(
                    ref[k], rowblock_sharding(mesh, 1), mesh)
        for k in ("bnd_dofs", "wp", "wp_df"):
            if ref.get(k) is not None:
                ref[k] = jax.tree_util.tree_map(
                    lambda v: jax.device_put(jnp.asarray(v), rep), ref[k])
        out["refined"] = ref
    # aux-space MG state and the BSR/COO tail index arrays (unstructured
    # meshes): replicated — the tail gathers and the cloud<->lattice
    # transfers index into (potentially resharded) vectors, and GSPMD
    # inserts the collectives the row-sharded consumers demand
    for k in ("mg_mask", "auxmg_tree", "coo_rows", "coo_cols"):
        if state.get(k) is not None:
            out[k] = jax.tree_util.tree_map(
                lambda v: jax.device_put(jnp.asarray(v), rep), state[k])
    return out
