"""Lattice fast path for the assembly reduction — dense interleaved adds.

Measured on v5e at 1.28M DOF: the generic padded gather-reduce of the
linear-phase tangent (32M dense storage slots) runs at random-access
rate (~1.5e8 elem/s) and costs ~1.5 s — 1000x below HBM stream rate.
On structured meshes with lattice control-point numbering
(mesh/fem_mesh.py) every contribution stream is *affine*: for a fixed
local pair (a, b) of a volume weak form, element (e_1..e_d) contributes
to storage slot

    base + ravel_lattice(p * e + k0)        (p = itp order per axis)

i.e. contributions tile a stride-p sub-lattice of one dense diagonal
segment (and likewise residual streams tile the DOF lattice).  The
reduction is then a zero-interleave (``jnp.pad`` with static widths —
pure dense data movement, no gathers/scatters) followed by a contiguous
slice-add into the storage vector.  Streams that fail the exact host-
side verification (boundary parts, unstructured meshes, COO spill) fall
back to the generic gather maps.

This replaces, at dense-stream rate, what the reference does with CUDA
atomic scatter-adds (solver/06_FEM_Kernel.jl:28-63).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FastStream:
    """One affine contribution column: add vals[:, col] (el-major) into
    ``target[base : base + prod(lattice)]`` at sub-lattice ``p*e + k0``."""
    col: int                      # flat column index within the stream
    base: int                     # storage/dof offset of the lattice block
    k0: Tuple[int, ...]           # per-axis start within the lattice
    p: int                        # per-axis stride (itp order)
    el_grid: Tuple[int, ...]      # element grid (row-major = el order)
    lattice: Tuple[int, ...]      # cp lattice shape of the block


def fit_stream_columns(slots: np.ndarray, lattice: Tuple[int, ...],
                       block_of: "callable"):
    """Try to express the columns of ``slots`` [E, n_cols] as affine
    sub-lattice maps.  ``block_of(slot)`` -> base of the lattice block
    containing the slot (dense-segment start for K, dof-block start for
    residuals), or None.  Returns (fast_list, rest_cols): FastStream per
    fitting column + the indices of columns that must use the generic
    gather path (e.g. pairs whose offset spilled to the COO tail).
    Returns (None, all columns) when the element grid itself does not
    factor (unstructured mesh / reordered elements)."""
    E, n_cols = slots.shape
    all_cols = np.arange(n_cols)
    n_cp = int(np.prod(lattice))

    # infer the element grid: common stride p with (L-1) % p == 0
    el_grid = None
    for p in (1, 2, 3, 4):
        if all((L - 1) % p == 0 and (L - 1) // p > 0 for L in lattice):
            cand = tuple((L - 1) // p for L in lattice)
            if int(np.prod(cand)) == E:
                el_grid = cand
                p_fit = p
                break
    if el_grid is None:
        return None, all_cols

    grids = np.meshgrid(*[np.arange(g) for g in el_grid], indexing="ij")
    strides = np.cumprod((1,) + lattice[:0:-1])[::-1]

    out: List[FastStream] = []
    rest: List[int] = []
    for c in range(n_cols):
        col = slots[:, c]
        base = block_of(int(col[0]))
        ok = base is not None
        if ok:
            rel0 = int(col[0]) - base
            ok = 0 <= rel0 < n_cp
        if ok:
            k0 = np.unravel_index(rel0, lattice)
            ok = (all(int(k) <= p_fit for k in k0)      # k0 in [0, p]
                  and all(int(k) + p_fit * (g - 1) < L
                          for k, g, L in zip(k0, el_grid, lattice)))
        if ok:
            expect = base + sum(
                (p_fit * g.reshape(-1) + int(k)) * s
                for g, k, s in zip(grids, k0, strides))
            ok = np.array_equal(expect, col)
        if ok:
            out.append(FastStream(col=c, base=base,
                                  k0=tuple(int(k) for k in k0), p=p_fit,
                                  el_grid=el_grid, lattice=lattice))
        else:
            rest.append(c)
    return out, np.asarray(rest, dtype=np.int64)


def gather_lattice_nodes(block_vals: jnp.ndarray,
                         fs_list: List[FastStream]) -> jnp.ndarray:
    """Inverse-direction fast path: read the element-node values
    ``out[e, a] = block_vals[ravel(p*e + k0_a)]`` as per-node strided
    lattice slices (dense strided loads) instead of a [E, na] gather —
    the gather runs at random-access rate (~1.5e8/s), ~100x slower than
    the strided read at 1M DOF."""
    fs0 = fs_list[0]
    lat = block_vals.reshape(fs0.lattice)
    cols = []
    for fs in fs_list:
        sl = tuple(slice(k, k + fs.p * (g - 1) + 1, fs.p)
                   for k, g in zip(fs.k0, fs.el_grid))
        cols.append(lat[sl].reshape(-1))
    return jnp.stack(cols, axis=1)                 # [E, na]


#: scan-interleave mode: True/False force, None = auto (enabled when the
#: summed interleave temporaries of one reduction would exceed
#: SCAN_AUTO_BYTES — the 3D regime where XLA's unrolled form was measured
#: at a 9.6 GB temp arena; the unrolled form stays for small footprints
#: where cross-stream fusion wins).  Env override: METAFEM_SCAN_INTERLEAVE.
import os as _os

SCAN: Optional[bool] = (None if "METAFEM_SCAN_INTERLEAVE" not in _os.environ
                        else _os.environ["METAFEM_SCAN_INTERLEAVE"] == "1")
SCAN_AUTO_BYTES = 1 << 30


def use_scan_interleave(n_fast_cols: int, n_cp: int, itemsize: int) -> bool:
    if SCAN is not None:
        return SCAN
    return n_fast_cols * n_cp * itemsize > SCAN_AUTO_BYTES


_SEL_CACHE = {}


def _selection(g: int, L: int, p: int, k0: int, dtype) -> np.ndarray:
    """[g, L] 0/1 matrix: row e selects lattice point p*e + k0."""
    key = (g, L, p, k0, np.dtype(dtype).str)
    S = _SEL_CACHE.get(key)
    if S is None:
        S = np.zeros((g, L), dtype)
        S[np.arange(g), p * np.arange(g) + k0] = 1
        _SEL_CACHE[key] = S
    return S


def interleave_stream(vals_col: jnp.ndarray, fs: FastStream) -> jnp.ndarray:
    """Zero-interleave one contribution column onto its lattice block:
    returns the flat [n_cp] block-local array.

    Implemented as one tiny 0/1 selection matmul per axis (exact value
    placement, MXU work, ~9 distinct [g, L] constants shared across all
    streams).  The earlier pad-based form reshaped through
    [g,1,g,1,g,1]-style shapes whose trailing singleton dims force
    (8,128)-tile layouts — measured ~5 GB of generated code + 5 GB temp
    arena for the 3D linear tangent."""
    dim = len(fs.el_grid)
    c = vals_col.reshape(fs.el_grid)
    for a in range(dim):
        S = jnp.asarray(_selection(fs.el_grid[a], fs.lattice[a], fs.p,
                                   fs.k0[a], vals_col.dtype))
        c = jnp.moveaxis(jnp.tensordot(c, S, axes=([a], [0])), -1, a)
    return c.reshape(-1)


def apply_fast_stream(target: jnp.ndarray, vals_col: jnp.ndarray,
                      fs: FastStream) -> jnp.ndarray:
    """target[base : base+n_cp] += interleave(vals_col)."""
    n_cp = int(np.prod(fs.lattice))
    return target.at[fs.base:fs.base + n_cp].add(
        interleave_stream(vals_col, fs))


def scan_apply_group(target: jnp.ndarray,
                     pairs: List[Tuple[jnp.ndarray, FastStream]]
                     ) -> jnp.ndarray:
    """Accumulate every (vals_col, FastStream) pair of one lattice group
    (same lattice/el_grid/p; base and k0 vary) into the flat ``target``
    via ONE ``lax.scan`` over stacked selection matrices.

    The unrolled form (interleave_stream per column + block sums) keeps
    one [n_cp] temp live per column: at 3D 1.4M-DOF scale (~400 K
    columns x 5.4 MB blocks) XLA's schedule was measured at a 9.6 GB
    temp arena.  The scan body touches exactly one [n_cp] window per
    iteration (read-modify-write at a traced base), bounding liveness to
    O(n_cp) regardless of column count, with one compiled body instead
    of 400 unrolled interleaves.  Deterministic: fixed list order."""
    import jax.lax as lax

    fs0 = pairs[0][1]
    dim = len(fs0.el_grid)
    n_cp = int(np.prod(fs0.lattice))
    dtype = pairs[0][0].dtype
    cols = jnp.stack([c for c, _ in pairs])              # [n, E]
    sels = tuple(
        jnp.asarray(np.stack([_selection(fs.el_grid[a], fs.lattice[a],
                                         fs.p, fs.k0[a], dtype)
                              for _, fs in pairs]))      # [n, g_a, L_a]
        for a in range(dim))
    bases = jnp.asarray(np.array([fs.base for _, fs in pairs], np.int32))

    def body(tgt, xs):
        c = xs[0].reshape(fs0.el_grid)
        for a in range(dim):
            c = jnp.moveaxis(jnp.tensordot(c, xs[1 + a],
                                           axes=([a], [0])), -1, a)
        win = lax.dynamic_slice(tgt, (xs[-1],), (n_cp,))
        return lax.dynamic_update_slice(tgt, win + c.reshape(-1),
                                        (xs[-1],)), None

    target, _ = lax.scan(body, target, (cols,) + sels + (bases,))
    return target


def concat_fast_blocks(block_sums: dict, block_extents, total: int,
                       dtype) -> jnp.ndarray:
    """Assemble a flat [total] vector from per-block partial sums by ONE
    concatenate — no updates of the big buffer.  Measured necessity: 400
    sequential ``.at[seg].add`` ops on a 675 MB storage vector made XLA
    emit 5 GB of program code and a 5 GB temp arena for the 3D linear
    tangent; the concat form is a single stream write.

    ``block_sums``: {base: [n] partial}; ``block_extents``: ordered
    (base, n) covering [0, total) contiguously (gaps filled with
    zeros)."""
    parts = []
    pos = 0
    for base, n in block_extents:
        assert base == pos, "blocks must tile the storage contiguously"
        parts.append(block_sums.get(base)
                     if block_sums.get(base) is not None
                     else jnp.zeros(n, dtype))
        pos += n
    if pos < total:
        parts.append(jnp.zeros(total - pos, dtype))
    return jnp.concatenate(parts)


def scan_apply_group_df(target, pairs):
    """Two-float scan_apply_group: ``target`` and the value columns are
    DF pairs.  The selection matmuls place values without rounding (0/1
    matrices — each output receives exactly one input), so hi and lo
    interleave independently; only the window accumulation needs the
    compensated add (cross-stream contributions cancel)."""
    import jax.lax as lax
    from ..linsolve import twofloat as tf

    fs0 = pairs[0][1]
    dim = len(fs0.el_grid)
    n_cp = int(np.prod(fs0.lattice))
    cols_hi = jnp.stack([c.hi for c, _ in pairs])        # [n, E]
    cols_lo = jnp.stack([c.lo for c, _ in pairs])
    sels = tuple(
        jnp.asarray(np.stack([_selection(fs.el_grid[a], fs.lattice[a],
                                         fs.p, fs.k0[a], np.float32)
                              for _, fs in pairs]))
        for a in range(dim))
    bases = jnp.asarray(np.array([fs.base for _, fs in pairs], np.int32))

    def interleave(flat, xs):
        c = flat.reshape(fs0.el_grid)
        for a in range(dim):
            c = jnp.moveaxis(jnp.tensordot(c, xs[2 + a],
                                           axes=([a], [0])), -1, a)
        return c.reshape(-1)

    def body(tgt, xs):
        hi, lo = tgt
        c = tf.DF(interleave(xs[0], xs), interleave(xs[1], xs))
        base = xs[-1]
        win = tf.DF(lax.dynamic_slice(hi, (base,), (n_cp,)),
                    lax.dynamic_slice(lo, (base,), (n_cp,)))
        new = tf.df_add(win, c)
        return (lax.dynamic_update_slice(hi, new.hi, (base,)),
                lax.dynamic_update_slice(lo, new.lo, (base,))), None

    (hi, lo), _ = lax.scan(body, (target.hi, target.lo),
                           (cols_hi, cols_lo) + sels + (bases,))
    return tf.DF(hi, lo)
