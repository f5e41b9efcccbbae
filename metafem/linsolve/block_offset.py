"""Block-offset ("generalized stencil") sparse storage — the TPU-native
matrix format.

Measurement on TPU v5e: random HBM accesses run at ~1.5e8/s regardless of
locality, so CSR SpMV (x[cols] gather + row reduction over nnz ~ 15M at
1M DOF) costs ~250 ms/iteration — hopeless for Krylov.  But FEM matrices
in a lexicographic control-point numbering concentrate their entries on a
small set of *column-minus-row offsets* per variable-pair block (exactly
a stencil on structured meshes, approximately on unstructured ones).

Storage: for every workpiece, variable pair (pd, pb) and popular offset
d, a DENSE diagonal segment of length n_cp (absent entries are stored
zeros and never touched by assembly).  Rare offsets spill to a small COO
tail.  SpMV becomes

    y[row_block] += seg * shift(x[col_block], d)        (dense, ~HBM rate)
    + tiny COO gather/segment-sum for the tail

and the assembly's gather-reduce maps target this storage directly, so
the Newton path never materializes CSR at all.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: dense segment: (row0, col0, n_cp, offset d, storage base)
Segment = Tuple[int, int, int, int, int]


@dataclasses.dataclass(frozen=True)
class PallasGroup:
    """Static description of one workpiece's dense region for the fused
    Pallas SpMV (pallas_spmv.py): storage rows are unit-major,
    offset-minor (offsets sorted) over ``[len(units), n_off, n_cp]``."""
    dof_offset: int
    n_cp: int
    n_vars: int
    n_off: int
    offsets: Tuple[int, ...]            # sorted dense offsets
    units: Tuple[Tuple[int, int], ...]  # (dual_pos, base_pos) in unit order
    base: int                           # start of this region in storage


@dataclasses.dataclass(eq=False)  # id-hash: used as static jit aux data
class OffsetLayout:
    """Static (host) description of the block-offset storage.

    ``blk_b > 0``: the tail is stored as dense ``blk_b x blk_b`` BSR
    blocks instead of scalar COO entries, and ``coo_rows``/``coo_cols``
    hold BLOCK row/col ids (length = number of blocks).  One gather
    index then moves ``blk_b`` contiguous x values and the products run
    dense — the fix for unstructured tails at the TPU random-gather
    floor (~1.5e8 scalar gathers/s regardless of locality).  Requires a
    locality cp numbering (fem_mesh._morton_renumber) to keep the block
    fill factor low (~9x at b=8 on the pikachu tet mesh vs 57x in file
    order).

    Tail storage order is COMPONENT-MAJOR: entry (i, j) of block k
    lives at ``n_dense + (i*b + j)*n_blocks + k``, so the device view
    ``vals[n_dense:].reshape(b, b, nb)`` keeps the huge block axis in
    the LANE (minor) dimension.  The block-major view ``[nb, b, b]``
    gets XLA's T(8,128) tiling on the trailing (8, 8) dims — 16x HBM
    padding, an 18.7 GB allocation at pikachu-refine-2 scale (measured
    compile OOM); the component-major view is pad-free and its mv
    measured 84 ms vs 812 ms scalar at the same 4.58M-block size."""
    n: int                       # matrix dimension
    segments: Tuple[Segment, ...]
    n_storage: int               # dense part + tail
    n_dense: int
    coo_rows: np.ndarray         # [n_coo] tail rows (BLOCK ids if blk_b)
    coo_cols: np.ndarray
    storage_of_slot: np.ndarray  # [nnz] logical COO slot -> storage index
    diag_storage: np.ndarray     # [n] storage index of each diagonal entry
    pallas_groups: Tuple[PallasGroup, ...] = ()
    blk_b: int = 0               # BSR tail block size (0 = scalar COO)

    @property
    def n_coo(self) -> int:
        return self.coo_rows.size

    @property
    def n_block_rows(self) -> int:
        return -(-self.n // self.blk_b)


def build_offset_layout(wp_metas, nnz: int,
                        dense_budget_ratio: float = 6.0,
                        min_count_ratio: float = 1 / 16,
                        max_dense_offsets: int = 136,
                        dense_min_n: int = 4096,
                        blk_b: int = 8,
                        blk_min_tail: int = 500_000) -> OffsetLayout:
    """``wp_metas``: per workpiece a dict with dof_offset, n_cp, units
    ({unit: (dual_pos, base_pos)}), sparse_entry, unitsize, ci, cj (the
    unique cp pair arrays).

    Dense segments only pay off on large blocks (each is a separate
    fused op; hundreds of tiny segments explode compile time), so blocks
    with n_cp < dense_min_n use the COO tail except for the diagonal,
    and the offset count is capped at max_dense_offsets."""
    # storage indices fit int32 whenever the (over)estimated dense part
    # + tail do — halves the big first-touch allocations on this
    # page-fault-bound host
    est_dense = sum(len(m["units"]) * (max_dense_offsets + 1) * m["n_cp"]
                    for m in wp_metas)
    sdtype = np.int32 if nnz + est_dense < 2 ** 31 - 1 else np.int64
    storage_of_slot = np.full(nnz, -1, dtype=sdtype)
    segments: List[Segment] = []
    pallas_groups: List[PallasGroup] = []
    coo_rows_parts, coo_cols_parts, coo_slot_parts = [], [], []
    base = 0
    n = 0
    diag_info = []                      # (row0, n_cp, base)
    for m in wp_metas:
        n_cp = m["n_cp"]
        n = max(n, m["dof_offset"] + m["n_vars"] * n_cp)
        ci, cj = m["ci"], m["cj"]
        # shifted offsets d + n_cp, in the narrowest dtype (one temp)
        if ci.dtype == np.int32 and 2 * n_cp < 2 ** 31 - 1:
            dsh = cj - ci
            dsh += np.int32(n_cp)
        else:
            dsh = cj.astype(np.int64) - ci
            dsh += n_cp
        # offset histogram by bincount (O(n); np.unique's sort measured
        # ~10 s at the 116M-pair scale of a 176k-cp tet mesh)
        hist = np.bincount(dsh, minlength=2 * n_cp + 1)
        offs = np.nonzero(hist)[0]
        counts = hist[offs]
        offs = offs - n_cp
        order = np.argsort(-counts)
        offs, counts = offs[order], counts[order]
        # choose dense offsets: popular enough, within the storage budget
        budget = dense_budget_ratio * ci.size   # per unit, in stored vals
        dense_offs = []
        spent = 0
        if n_cp >= dense_min_n:
            for d, c in zip(offs, counts):
                if len(dense_offs) >= max_dense_offsets:
                    break
                if c < max(1, int(min_count_ratio * n_cp)):
                    continue
                if spent + n_cp > max(budget, n_cp):
                    break
                dense_offs.append(int(d))
                spent += n_cp
        if 0 not in dense_offs:
            dense_offs.append(0)        # the diagonal is always dense
        dense_set = {d: k for k, d in enumerate(sorted(dense_offs))}
        # O(1)-lookup table offset -> dense rank (np.isin/searchsorted
        # over the 100M+ raw-pair arrays cost seconds each per unit)
        rank_lut = np.full(2 * n_cp + 1, -1, np.int32)
        for d, kk in dense_set.items():
            rank_lut[d + n_cp] = kk
        d_rank = rank_lut[dsh]
        is_dense = d_rank >= 0
        # hoisted per-wp selections (the unit loop reuses them; each is
        # a fresh big array on this page-fault-bound host)
        ci_dense = ci[is_dense]
        rk_dense = d_rank[is_dense]
        any_coo = not is_dense.all()
        if any_coo:
            sel = ~is_dense
            ci_sel, cj_sel = ci[sel], cj[sel]
            flat_sel = np.flatnonzero(sel)
        del dsh, d_rank

        unit_order = sorted(m["units"].items())
        pallas_groups.append(PallasGroup(
            dof_offset=m["dof_offset"], n_cp=n_cp, n_vars=m["n_vars"],
            n_off=len(dense_set), offsets=tuple(sorted(dense_set)),
            units=tuple(pair for _u, pair in unit_order), base=base))

        for u, (pd, pb) in sorted(m["units"].items()):
            row0 = m["dof_offset"] + pd * n_cp
            col0 = m["dof_offset"] + pb * n_cp
            u_base = {}
            for d in sorted(dense_set):
                segments.append((row0, col0, n_cp, d, base))
                u_base[d] = base
                if pd == pb and d == 0:
                    diag_info.append((row0, n_cp, base))
                base += n_cp
            # map this unit's slots: masked assignment into a VIEW of
            # storage_of_slot (no slot-id arange materialization)
            slot0 = m["sparse_entry"] + u * m["unitsize"]
            sos_view = storage_of_slot[slot0:slot0 + ci.size]
            if dense_set:
                bases = np.asarray(
                    [u_base[d] for d in sorted(dense_set)], sdtype)
                sos_view[is_dense] = bases[rk_dense] + ci_dense
            if any_coo:
                coo_rows_parts.append(row0 + ci_sel)
                coo_cols_parts.append(col0 + cj_sel)
                coo_slot_parts.append(slot0 + flat_sel)

    n_dense = base
    use_blk = 0
    if coo_rows_parts:
        coo_rows = np.concatenate(coo_rows_parts).astype(np.int32,
                                                         copy=False)
        coo_cols = np.concatenate(coo_cols_parts).astype(np.int32,
                                                         copy=False)
        coo_slots = np.concatenate(coo_slot_parts)
        if blk_b and coo_rows.size >= blk_min_tail:
            # BSR tail: group entries into blk_b x blk_b dense blocks
            # over global dof ids.  Entries land at a unique in-block
            # position (logical pairs are unique); uncovered positions
            # are stored zeros never touched by assembly.
            from ..native import unique_pairs
            b = int(blk_b)
            use_blk = b
            bi = coo_rows.astype(np.int64) // b
            bj = coo_cols.astype(np.int64) // b
            nbr = -(-n // b)
            b_rows, b_cols, inv = unique_pairs(bi, bj, nbr)
            if nnz + n_dense + b_rows.size * b * b >= 2 ** 31 - 1:
                storage_of_slot = storage_of_slot.astype(np.int64)
                sdtype = np.int64
            # component-major (see class docstring): slot (i, j) of
            # block inv -> n_dense + (i*b + j)*n_blocks + inv
            storage_of_slot[coo_slots] = (
                n_dense
                + ((coo_rows.astype(sdtype, copy=False) % b) * b
                   + coo_cols % b) * b_rows.size
                + inv.astype(sdtype, copy=False))
            n_tail = b_rows.size * b * b
            coo_rows = b_rows.astype(np.int32, copy=False)
            coo_cols = b_cols.astype(np.int32, copy=False)
        else:
            storage_of_slot[coo_slots] = n_dense + np.arange(
                coo_rows.size, dtype=sdtype)
            n_tail = coo_rows.size
            if n_tail % 8:
                # round the scalar tail up to a multiple of 8 with
                # never-written (0, 0, value 0) entries, so n_storage
                # stays divisible by small device-mesh extents and the
                # row-sharded layouts split evenly (rowshard.py); the
                # zero values contribute nothing to any SpMV
                pad = 8 - n_tail % 8
                coo_rows = np.concatenate(
                    [coo_rows, np.zeros(pad, np.int32)])
                coo_cols = np.concatenate(
                    [coo_cols, np.zeros(pad, np.int32)])
                n_tail += pad
    else:
        coo_rows = np.zeros(0, np.int32)
        coo_cols = np.zeros(0, np.int32)
        n_tail = 0
    n_storage = n_dense + n_tail
    assert (storage_of_slot >= 0).all(), "unmapped sparse slot"

    diag_storage = np.full(n, -1, dtype=np.int64)
    for (row0, n_cp, b) in diag_info:
        diag_storage[row0:row0 + n_cp] = b + np.arange(n_cp)

    return OffsetLayout(n=n, segments=tuple(segments),
                        n_storage=n_storage, n_dense=n_dense,
                        coo_rows=coo_rows, coo_cols=coo_cols,
                        storage_of_slot=storage_of_slot,
                        diag_storage=diag_storage,
                        pallas_groups=tuple(pallas_groups),
                        blk_b=use_blk)


#: dense-segment SpMV form policy.  The per-segment unrolled shifted
#: multiply-adds fuse into ONE pass over the segment values (measured
#: 0.219 ms vs 1.531 ms for the grouped form at 1.28M DOF / 25 segments
#: on v5e — the grouped form materializes the [n_off, C, n_cp] shifted-x
#: stack, tripling HBM traffic).  The grouped form exists for large
#: segment counts only: 1053 unrolled slice ops (3D vector elasticity)
#: blow compile time and program size.  Strictly below the threshold
#: unrolls; at or above it groups.  Override: METAFEM_MV_UNROLL_MAX —
#: note the two forms sum segment contributions in different orders, so
#: changing the policy changes results at the ULP level (each form is
#: individually deterministic and bit-reproducible run to run).
import os as _os

UNROLL_MAX_SEGMENTS = int(_os.environ.get("METAFEM_MV_UNROLL_MAX", 300))


def tail_runs(layout: "OffsetLayout"):
    """Static run structure of the sorted tail block rows: (run start
    indices int32, block-row id per run int32, tree levels).  Cached on
    the layout (layouts are id-hashed static jit aux data).  Consumed
    by the segmented-tree reductions here and in twofloat.py."""
    cached = getattr(layout, "_tail_runs", None)
    if cached is None:
        rows = np.asarray(layout.coo_rows)
        starts = np.flatnonzero(
            np.concatenate([[True], rows[1:] != rows[:-1]]))
        run_rows = rows[starts].astype(np.int32)
        lens = np.diff(np.concatenate([starts, [rows.size]]))
        levels = int(np.ceil(np.log2(max(int(lens.max()), 1)))) \
            if lens.size else 0
        cached = (starts.astype(np.int32), run_rows, levels)
        layout._tail_runs = cached
    return cached


def _seg_tree_sum(vals: jnp.ndarray, rows: jnp.ndarray,
                  n_levels: int) -> jnp.ndarray:
    """Segmented sum over SORTED segment ids by strided doubling
    (Hillis-Steele) on the lane axis — log2(max run) dense masked adds,
    zero scatter index ops.  Run sums land at run START positions.
    Deterministic (fixed tree order); see twofloat.df_segsum_sorted for
    the error-free two-float variant."""
    nb = vals.shape[-1]
    for lvl in range(n_levels):
        s = 1 << lvl
        if s >= nb:
            break
        same = (rows[s:] == rows[:-s])
        mask = jnp.concatenate(
            [same, jnp.zeros(s, bool)]).astype(vals.dtype)
        z = jnp.zeros(vals.shape[:-1] + (s,), vals.dtype)
        sh = jnp.concatenate([vals[..., s:], z], axis=-1)
        vals = vals + sh * mask
    return vals


def _shift_mul(seg_vals, x_col, d):
    """y_seg[r] = seg_vals[r] * x_col[r + d] with zero out-of-range."""
    n = x_col.shape[0]
    if d == 0:
        return seg_vals * x_col
    if d > 0:
        shifted = jnp.concatenate(
            [x_col[d:], jnp.zeros(d, x_col.dtype)])
    else:
        shifted = jnp.concatenate(
            [jnp.zeros(-d, x_col.dtype), x_col[:n + d]])
    return seg_vals * shifted


def _shift_store(y, row0, contrib):
    return y.at[row0:row0 + contrib.shape[0]].add(contrib)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class OffsetMatrix:
    """Square sparse matrix in block-offset storage (SparseMatrix API)."""
    vals: jnp.ndarray            # [n_storage]
    coo_rows: jnp.ndarray        # device copies of the tail indices
    coo_cols: jnp.ndarray
    layout: OffsetLayout         # static

    def tree_flatten(self):
        return (self.vals, self.coo_rows, self.coo_cols), (self.layout,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_values(cls, vals: jnp.ndarray,
                    layout: OffsetLayout) -> "OffsetMatrix":
        return cls(vals, jnp.asarray(layout.coo_rows),
                   jnp.asarray(layout.coo_cols), layout)

    @property
    def n(self) -> int:
        return self.layout.n

    def _blk_tail_mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """BSR tail: y += sum_k B[k] @ x_block[bcol[k]].  One gather
        index moves blk_b contiguous x values; the contraction runs
        over the component-major [b, b, nb] view (nb in lanes,
        pad-free) and the cross-block reduction is a segmented TREE
        over the sorted block rows (_seg_tree_sum) — log2(max
        blocks/row) dense masked adds instead of an nb-index
        scatter-add."""
        lo = self.layout
        b, nbr = lo.blk_b, lo.n_block_rows
        B3 = self.vals[lo.n_dense:].reshape(b, b, lo.n_coo)
        xp = jnp.pad(x, (0, nbr * b - lo.n)).reshape(nbr, b)
        xg = xp[self.coo_cols]                       # [nb, b] row gather
        contribT = jnp.einsum("ijk,jk->ik", B3, xg.T)    # [b, nb]
        starts_np, run_rows_np, n_levels = tail_runs(lo)
        summed = _seg_tree_sum(contribT, self.coo_rows, n_levels)
        runs = jnp.take(summed, jnp.asarray(starts_np), axis=1)
        yb = jnp.zeros((nbr, b), x.dtype).at[
            jnp.asarray(run_rows_np)].set(runs.T)
        return yb.reshape(-1)[:lo.n]

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        lo = self.layout
        from . import pallas_spmv
        if (lo.pallas_groups and not lo.blk_b
                and pallas_spmv.decide(x.dtype)):
            return pallas_spmv.offset_mv(
                self.vals, x, lo, self.coo_rows, self.coo_cols,
                interpret=pallas_spmv.interpret_mode())
        if lo.pallas_groups and len(lo.segments) >= UNROLL_MAX_SEGMENTS:
            y = self._grouped_dense_mv(x)
        else:
            y = jnp.zeros(lo.n, x.dtype)
            for (row0, col0, n_cp, d, b) in lo.segments:
                seg = self.vals[b:b + n_cp]
                contrib = _shift_mul(seg, x[col0:col0 + n_cp], d)
                y = _shift_store(y, row0, contrib)
        if lo.blk_b:
            y = y + self._blk_tail_mv(x)
        elif lo.n_coo:
            coo_vals = self.vals[lo.n_dense:]
            y = y + jax.ops.segment_sum(coo_vals * x[self.coo_cols],
                                        self.coo_rows, num_segments=lo.n)
        return y

    def _grouped_dense_mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Dense-segment SpMV in grouped form: one shifted-x stack per
        workpiece + a per-unit multiply-reduce over (offset, point).
        The per-segment loop unrolls n_units * n_off separate slice ops
        — 1053 for 3D vector elasticity (C=3, 117 offsets), which blows
        compile time and program size; this form is ~n_off + n_units
        ops."""
        lo = self.layout
        y = jnp.zeros(lo.n, x.dtype)
        for grp in lo.pallas_groups:
            C, n_cp, n_off = grp.n_vars, grp.n_cp, grp.n_off
            G = len(grp.units)
            xw = jax.lax.dynamic_slice(
                x, (grp.dof_offset,), (C * n_cp,)).reshape(C, n_cp)
            R = int(max(abs(d) for d in grp.offsets))
            xp = jnp.pad(xw, ((0, 0), (R, R)))
            shifted = jnp.stack(
                [xp[:, R + d:R + d + n_cp] for d in grp.offsets])
            vals = jax.lax.dynamic_slice(
                self.vals, (grp.base,), (G * n_off * n_cp,)
            ).reshape(G, n_off, n_cp)
            yw = [None] * C
            for g, (pd, pb) in enumerate(grp.units):
                c = jnp.einsum("kn,kn->n", vals[g], shifted[:, pb])
                yw[pd] = c if yw[pd] is None else yw[pd] + c
            yb = jnp.concatenate(
                [w if w is not None else jnp.zeros(n_cp, x.dtype)
                 for w in yw])
            y = jax.lax.dynamic_update_slice(y, yb, (grp.dof_offset,))
        return y

    def tmv(self, x: jnp.ndarray) -> jnp.ndarray:
        lo = self.layout
        y = jnp.zeros(lo.n, x.dtype)
        for (row0, col0, n_cp, d, b) in lo.segments:
            seg = self.vals[b:b + n_cp]
            # transpose: y[col0 + r + d] += seg[r] * x[row0 + r]
            contrib = seg * x[row0:row0 + n_cp]
            if d == 0:
                shifted = contrib
            elif d > 0:
                shifted = jnp.concatenate(
                    [jnp.zeros(d, x.dtype), contrib[:n_cp - d]])
            else:
                shifted = jnp.concatenate(
                    [contrib[-d:], jnp.zeros(-d, x.dtype)])
            y = _shift_store(y, col0, shifted)
        if lo.blk_b:
            b, nbr = lo.blk_b, lo.n_block_rows
            B3 = self.vals[lo.n_dense:].reshape(b, b, lo.n_coo)
            xp = jnp.pad(x, (0, nbr * b - lo.n)).reshape(nbr, b)
            xg = xp[self.coo_rows]
            contribT = jnp.einsum("ijk,ik->jk", B3, xg.T)  # [b, nb]
            yb = jax.ops.segment_sum(contribT.T, self.coo_cols,
                                     num_segments=nbr)
            y = y + yb.reshape(-1)[:lo.n]
        elif lo.n_coo:
            coo_vals = self.vals[lo.n_dense:]
            y = y + jax.ops.segment_sum(coo_vals * x[self.coo_rows],
                                        self.coo_cols, num_segments=lo.n)
        return y

    def diag(self, diag_pos=None) -> jnp.ndarray:
        lo = self.layout
        pos = np.where(lo.diag_storage < 0, 0, lo.diag_storage)
        d = self.vals[pos]
        return jnp.where(jnp.asarray(lo.diag_storage) < 0, 0.0, d)

    def scale_cols(self, s: jnp.ndarray) -> "OffsetMatrix":
        lo = self.layout
        vals = self.vals
        if lo.pallas_groups:
            for grp in lo.pallas_groups:
                C, n_cp, n_off = grp.n_vars, grp.n_cp, grp.n_off
                G = len(grp.units)
                sw = jax.lax.dynamic_slice(
                    s, (grp.dof_offset,), (C * n_cp,)).reshape(C, n_cp)
                R = int(max(abs(d) for d in grp.offsets))
                sp = jnp.pad(sw, ((0, 0), (R, R)))   # zeros: out-of-range
                shifted = jnp.stack(
                    [sp[:, R + d:R + d + n_cp] for d in grp.offsets])
                pbs = jnp.asarray([pb for (_pd, pb) in grp.units])
                sc = jnp.take(shifted, pbs, axis=1)  # [n_off, G, n_cp]
                sc = jnp.swapaxes(sc, 0, 1).reshape(-1)
                region = jax.lax.dynamic_slice(
                    vals, (grp.base,), (G * n_off * n_cp,))
                vals = jax.lax.dynamic_update_slice(
                    vals, region * sc, (grp.base,))
        else:
            for (row0, col0, n_cp, d, b) in lo.segments:
                sc = _shift_mul(jnp.ones(n_cp, s.dtype),
                                s[col0:col0 + n_cp], d)
                vals = vals.at[b:b + n_cp].multiply(sc)
        if lo.blk_b:
            b, nbr = lo.blk_b, lo.n_block_rows
            spT = jnp.pad(s, (0, nbr * b - lo.n)).reshape(nbr, b).T
            scT = jnp.take(spT, self.coo_cols, axis=1)       # [b, nb]
            tail = (vals[lo.n_dense:].reshape(b, b, lo.n_coo)
                    * scT[None, :, :])               # entry (i,j) *= s[col j]
            vals = vals.at[lo.n_dense:].set(tail.reshape(-1))
        elif lo.n_coo:
            vals = vals.at[lo.n_dense:].multiply(s[self.coo_cols])
        return OffsetMatrix(vals, self.coo_rows, self.coo_cols, lo)

    def scale_rows(self, s: jnp.ndarray) -> "OffsetMatrix":
        lo = self.layout
        vals = self.vals
        if lo.pallas_groups:
            for grp in lo.pallas_groups:
                C, n_cp, n_off = grp.n_vars, grp.n_cp, grp.n_off
                G = len(grp.units)
                sw = jax.lax.dynamic_slice(
                    s, (grp.dof_offset,), (C * n_cp,)).reshape(C, n_cp)
                pds = jnp.asarray([pd for (pd, _pb) in grp.units])
                sc = jnp.take(sw, pds, axis=0)       # [G, n_cp]
                sc = jnp.broadcast_to(sc[:, None, :],
                                      (G, n_off, n_cp)).reshape(-1)
                region = jax.lax.dynamic_slice(
                    vals, (grp.base,), (G * n_off * n_cp,))
                vals = jax.lax.dynamic_update_slice(
                    vals, region * sc, (grp.base,))
        else:
            for (row0, col0, n_cp, d, b) in lo.segments:
                vals = vals.at[b:b + n_cp].multiply(s[row0:row0 + n_cp])
        if lo.blk_b:
            b, nbr = lo.blk_b, lo.n_block_rows
            spT = jnp.pad(s, (0, nbr * b - lo.n)).reshape(nbr, b).T
            scT = jnp.take(spT, self.coo_rows, axis=1)       # [b, nb]
            tail = (vals[lo.n_dense:].reshape(b, b, lo.n_coo)
                    * scT[:, None, :])               # entry (i,j) *= s[row i]
            vals = vals.at[lo.n_dense:].set(tail.reshape(-1))
        elif lo.n_coo:
            vals = vals.at[lo.n_dense:].multiply(s[self.coo_rows])
        return OffsetMatrix(vals, self.coo_rows, self.coo_cols, lo)

    def to_scipy(self):
        import scipy.sparse as sp
        lo = self.layout
        rows, cols, vals = [], [], []
        v = np.asarray(self.vals)
        for (row0, col0, n_cp, d, b) in lo.segments:
            r = np.arange(n_cp)
            c = r + d
            ok = (c >= 0) & (c < n_cp)
            rows.append(row0 + r[ok])
            cols.append(col0 + c[ok])
            vals.append(v[b:b + n_cp][ok])
        if lo.blk_b:
            b = lo.blk_b
            br = np.asarray(self.coo_rows, np.int64)
            bc = np.asarray(self.coo_cols, np.int64)
            tv = v[lo.n_dense:].reshape(b, b, -1)    # component-major
            r = np.broadcast_to(
                br[None, None, :] * b + np.arange(b)[:, None, None],
                tv.shape)                            # [b, b, nb]
            c = np.broadcast_to(
                bc[None, None, :] * b + np.arange(b)[None, :, None],
                tv.shape)
            ok = (r < lo.n) & (c < lo.n)             # padded edge blocks
            rows.append(r[ok])
            cols.append(c[ok])
            vals.append(tv[ok])
        else:
            rows.append(np.asarray(self.coo_rows))
            cols.append(np.asarray(self.coo_cols))
            vals.append(v[lo.n_dense:])
        return sp.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(lo.n, lo.n))
