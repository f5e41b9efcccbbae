"""Double-f32 ("two-float") vector arithmetic: ~2^-48 relative precision
at native f32 VPU rate.

XLA:TPU emulates f64 in software at a devastating cost for the
bandwidth-bound vector ops the refined Newton path needs — measured at
1.28M DOF on v5e: offset-SpMV 100 ms in f64 vs 0.12 ms in f32, a plain
norm 27 ms.  Classic error-free-transformation arithmetic (Dekker 1971;
Ogita-Rump-Oishi dot2 — already used for the Krylov dots,
krylov._dot) represents each value as an (hi, lo) pair of f32 words
carrying ~48 significant bits, with every operation a handful of native
f32 VPU instructions.  That is 2x the data and ~10-20x the flops of
plain f32 — but these ops are HBM-bound, so the observed cost is ~2-4x
f32, i.e. 30-100x faster than emulated f64.

Used by solver/jit_step.make_refined_step for the exact-residual path:
the frozen affine operator A_td, the constant b, and the solution x all
live as DF pairs; residual evaluation is df_offset_mv + df adds; only
the tiny compact boundary assembly stays in emulated f64.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_offset import OffsetLayout


class DF(NamedTuple):
    """A two-float vector: value = hi + lo, |lo| <= ulp(hi)/2."""
    hi: jnp.ndarray
    lo: jnp.ndarray


#: XLA:CPU's fused-kernel emitter applies FMA contraction: inside a
#: fusion, ``s + a*b`` compiles to fma(a, b, s), skipping the f32
#: rounding of the product — which silently breaks every error-free
#: transform built on that rounding (measured: a jitted df_dot2 chain
#: degrades from 2^-48 to plain-f32 accuracy; the same program is exact
#: eagerly, exact with --xla_disable_hlo_passes=fusion, and exact on
#: TPU).  ``lax.optimization_barrier`` does NOT survive this XLA
#: version's CPU pipeline (fusions form straight through it), but
#: ``lax.reduce_precision(x, exp_bits, mantissa_bits)`` at the dtype's
#: own precision does: it is an explicit semantics-pinning op the
#: compiler keeps, and LLVM cannot contract a mul+add across the
#: intervening bit-manipulation.  Pins are inserted on the CPU backend
#: only; TPU preserves the EFT semantics under full fusion (verified)
#: and keeps the unpinned hot path.
_EFT_PIN = None


def _pin(x):
    global _EFT_PIN
    if _EFT_PIN is None:
        _EFT_PIN = jax.default_backend() == "cpu"
    if not _EFT_PIN:
        return x
    dt = getattr(x, "dtype", None)
    if dt == jnp.float32:
        return jax.lax.reduce_precision(x, 8, 23)
    if dt == jnp.float64:
        return jax.lax.reduce_precision(x, 11, 52)
    return x


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = _pin(a + b)          # pin the rounded sum before the error calc
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = _pin(a + b)
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (2^12+1 splits the
    24-bit f32 mantissa; same transform as krylov._two_prod)."""
    p = _pin(a * b)
    ca = _pin(a * 4097.0)    # Veltkamp split: fma(a,4097,-ca) would
    cb = _pin(b * 4097.0)    # fold the split constant — pin both
    ah = _pin(ca - (ca - a))
    bh = _pin(cb - (cb - b))
    al = a - ah
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_normalize(hi, lo) -> DF:
    s, e = fast_two_sum(hi, lo)
    return DF(s, e)


def df_from_f64(a) -> DF:
    """Split a (host) f64 array into an f32 pair — exact to ~2^-48."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_to_f64(x: DF) -> jnp.ndarray:
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def df_zeros_like(v) -> DF:
    return DF(jnp.zeros_like(v), jnp.zeros_like(v))


def df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, y.hi)
    return df_normalize(s, e + (x.lo + y.lo))


def df_add_f32(x: DF, v) -> DF:
    s, e = two_sum(x.hi, v)
    return df_normalize(s, e + x.lo)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_scale(x: DF, c) -> DF:
    """x * c with c a plain f32 scalar or array."""
    p, e = two_prod(x.hi, c)
    return df_normalize(p, e + x.lo * c)


def df_scale_df(x: DF, c: DF) -> DF:
    p, e = two_prod(x.hi, c.hi)
    return df_normalize(p, e + (x.hi * c.lo + x.lo * c.hi))


def df_const(c) -> DF:
    """Exact DF split of a host scalar."""
    c = np.float64(c)
    hi = np.float32(c)
    return DF(jnp.float32(hi), jnp.float32(np.float64(c) - np.float64(hi)))


def as_df(v) -> DF:
    """Coerce a float / f32 array / traced f64 scalar / DF to DF."""
    if isinstance(v, DF):
        return v
    if isinstance(v, (int, float)):
        return df_const(v)
    v = jnp.asarray(v)
    if v.dtype == jnp.float64:
        hi = v.astype(jnp.float32)
        return DF(hi, (v - hi.astype(jnp.float64)).astype(jnp.float32))
    return DF(v.astype(jnp.float32), jnp.zeros_like(v, jnp.float32))


def df_mul(x: DF, y: DF) -> DF:
    return df_scale_df(x, y)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_div(x: DF, y: DF) -> DF:
    """Long division: quotient digit + compensated remainder digit —
    ~2^-47 relative error, all native f32."""
    q0 = x.hi / y.hi
    r = df_add(x, df_neg(df_scale(y, q0)))
    q1 = r.hi / y.hi
    r2 = df_add(r, df_neg(df_scale(y, q1)))
    q2 = r2.hi / y.hi
    s, e = two_sum(q0, q1)
    return df_normalize(s, e + q2)


def df_dot2(pairs) -> DF:
    """Compensated sum of elementwise DF*DF products (Ogita-Rump-Oishi
    dot2 over a static list): hi products are error-free (two_prod), hi
    accumulation is two_sum-compensated, and every O(eps)-magnitude term
    (product errors, cross terms, lo accumulation) sums in plain f32 —
    total error ~2^-48 |sum|.  ``pairs``: iterable of (DF, DF) with
    broadcast-compatible components."""
    s = c = None
    for a, b in pairs:
        p, e = two_prod(a.hi, b.hi)
        e = e + (a.hi * b.lo + a.lo * b.hi)
        if s is None:
            s, c = p, e
        else:
            s, e2 = two_sum(s, p)
            c = c + (e + e2)
    return df_normalize(s, c)


def _shifted_stack(xw, offsets, n_cp):
    R = int(max(abs(d) for d in offsets)) if offsets else 0
    xp = jnp.pad(xw, ((0, 0), (R, R)))
    return jnp.stack([xp[:, R + d:R + d + n_cp] for d in offsets])


from .block_offset import tail_runs as _tail_runs  # shared run cache


def df_segsum_sorted(acc: DF, rows: jnp.ndarray, n_levels: int) -> DF:
    """Segmented reduction over SORTED segment ids by strided doubling
    (Hillis-Steele): after level L, acc[i] = sum of the original values
    in [i, min(run end, i + 2^L)).  Each level is one dense masked
    df_add over the lane axis — error-free two-float arithmetic, zero
    scatter/gather index ops.  With sorted ids, ``rows[i] == rows[i+s]``
    exactly characterizes "no run boundary inside the window".  The run
    sums land at the run START positions (extract with _tail_runs)."""
    nb = acc.hi.shape[-1]
    lead = acc.hi.shape[:-1]
    for lvl in range(n_levels):
        s = 1 << lvl
        if s >= nb:
            break
        same = (rows[s:] == rows[:-s])
        mask = jnp.concatenate(
            [same, jnp.zeros(s, bool)]).astype(acc.hi.dtype)
        z = jnp.zeros(lead + (s,), acc.hi.dtype)
        sh_hi = jnp.concatenate([acc.hi[..., s:], z], axis=-1)
        sh_lo = jnp.concatenate([acc.lo[..., s:], z], axis=-1)
        acc = df_add(acc, DF(sh_hi * mask, sh_lo * mask))
    return acc


def df_offset_mv(vals: DF, layout: OffsetLayout, x: DF,
                 coo_rows=None, coo_cols=None) -> DF:
    """y = A @ x with both the matrix values and the vector as DF pairs
    — the refined residual's workhorse.  Mirrors
    OffsetMatrix._grouped_dense_mv (block_offset.py): one shifted-x
    stack per workpiece, per-unit compensated accumulation over offsets.
    The rounding terms keep |error| ~ 2^-48 |A||x| per entry."""
    lo_ = layout
    y_hi = jnp.zeros(lo_.n, x.hi.dtype)
    y_lo = jnp.zeros(lo_.n, x.hi.dtype)
    for grp in lo_.pallas_groups:
        C, n_cp, n_off = grp.n_vars, grp.n_cp, grp.n_off
        G = len(grp.units)
        xw_hi = jax.lax.dynamic_slice(
            x.hi, (grp.dof_offset,), (C * n_cp,)).reshape(C, n_cp)
        xw_lo = jax.lax.dynamic_slice(
            x.lo, (grp.dof_offset,), (C * n_cp,)).reshape(C, n_cp)
        sh_hi = _shifted_stack(xw_hi, grp.offsets, n_cp)   # [n_off,C,n_cp]
        sh_lo = _shifted_stack(xw_lo, grp.offsets, n_cp)
        v_hi = jax.lax.dynamic_slice(
            vals.hi, (grp.base,), (G * n_off * n_cp,)).reshape(G, n_off,
                                                               n_cp)
        v_lo = jax.lax.dynamic_slice(
            vals.lo, (grp.base,), (G * n_off * n_cp,)).reshape(G, n_off,
                                                               n_cp)
        acc = [None] * C
        for g, (pd, pb) in enumerate(grp.units):
            a = DF(jnp.zeros(n_cp, x.hi.dtype), jnp.zeros(n_cp, x.hi.dtype))
            for k in range(n_off):
                p, e = two_prod(v_hi[g, k], sh_hi[k, pb])
                e = e + (v_hi[g, k] * sh_lo[k, pb]
                         + v_lo[g, k] * sh_hi[k, pb])
                a = df_add(a, DF(p, e))
            acc[pd] = a if acc[pd] is None else df_add(acc[pd], a)
        z = jnp.zeros(n_cp, x.hi.dtype)
        yb_hi = jnp.concatenate([a.hi if a is not None else z for a in acc])
        yb_lo = jnp.concatenate([a.lo if a is not None else z for a in acc])
        y_hi = jax.lax.dynamic_update_slice(y_hi, yb_hi, (grp.dof_offset,))
        y_lo = jax.lax.dynamic_update_slice(y_lo, yb_lo, (grp.dof_offset,))
    y = DF(y_hi, y_lo)
    if lo_.blk_b:
        # BSR tail (unstructured meshes, block_offset.py): per-entry
        # two-float products with a compensated in-block row sum — all
        # f32 VPU work over [nb, b] lanes — then ONE emulated-f64
        # cross-block segment reduction on the [nb, b] partials (the
        # scalar-tail path below pays that f64 reduction per ENTRY).
        rows = coo_rows if coo_rows is not None else jnp.asarray(
            lo_.coo_rows)
        cols = coo_cols if coo_cols is not None else jnp.asarray(
            lo_.coo_cols)
        b, nbr = lo_.blk_b, lo_.n_block_rows
        nb = lo_.n_coo
        # component-major [b, b, nb] views (block_offset.py docstring):
        # the block-major [nb, b, b] view gets 16x T(8,128) HBM padding.
        # Every large intermediate here keeps nb in the LANE dim ([b, nb]
        # or [nb] 1D) — the [nb, b]-shaped alternatives pad 16x (f32) /
        # 4.7 GB (the f64 segment input), which OOMed the first pikachu
        # integration at runtime.
        Bh = vals.hi[lo_.n_dense:].reshape(b, b, nb)
        Bl = vals.lo[lo_.n_dense:].reshape(b, b, nb)
        pad = nbr * b - lo_.n
        # ONE row gather for both words: x blocks stored as [nbr, 2b]
        # (hi | lo) rows, so each tail index moves the full pair — half
        # the gather index ops of separate hi/lo takes
        xp2 = jnp.concatenate(
            [jnp.pad(x.hi, (0, pad)).reshape(nbr, b),
             jnp.pad(x.lo, (0, pad)).reshape(nbr, b)], axis=1)
        xg2T = xp2[cols].T                                   # [2b, nb]
        xgT_h, xgT_l = xg2T[:b], xg2T[b:]
        z = jnp.zeros((b, nb), x.hi.dtype)
        acc = DF(z, z)
        for j in range(b):
            p, e = two_prod(Bh[:, j, :], xgT_h[j][None, :])
            e = e + (Bh[:, j, :] * xgT_l[j][None, :]
                     + Bl[:, j, :] * xgT_h[j][None, :])
            acc = df_add(acc, DF(p, e))
        # Cross-block reduction: error-free segmented TREE over the
        # sorted block rows (df_segsum_sorted) — log2(max blocks/row)
        # dense masked df_adds on [b, nb] lanes, ZERO scatter index ops
        # and no per-entry emulated-f64 work (the earlier f64
        # segment_sum forms paid ~37M emulated-f64 element ops at
        # pikachu refine-2: measured 678 ms/mv; this path needs f64 only
        # on the [b, n_runs] run sums).
        starts_np, run_rows_np, n_levels = _tail_runs(lo_)
        acc = df_segsum_sorted(acc, rows, n_levels)
        starts = jnp.asarray(starts_np)
        accS_hi = jnp.take(acc.hi, starts, axis=1)     # [b, n_runs]
        accS_lo = jnp.take(acc.lo, starts, axis=1)
        t64r = accS_hi.astype(jnp.float64) + accS_lo.astype(jnp.float64)
        t64b = jnp.zeros((nbr, b), jnp.float64).at[
            jnp.asarray(run_rows_np)].set(t64r.T)
        t64 = t64b.reshape(-1)[:lo_.n]
        t_hi = t64.astype(x.hi.dtype)
        t_lo = (t64 - t_hi.astype(jnp.float64)).astype(x.hi.dtype)
        y = df_add(y, DF(t_hi, t_lo))
    elif lo_.n_coo:
        # the (small) COO tail in emulated f64 — exact and cheap at tail
        # sizes; lattice meshes have an empty tail
        rows = coo_rows if coo_rows is not None else jnp.asarray(
            lo_.coo_rows)
        cols = coo_cols if coo_cols is not None else jnp.asarray(
            lo_.coo_cols)
        cv = (vals.hi[lo_.n_dense:].astype(jnp.float64)
              + vals.lo[lo_.n_dense:].astype(jnp.float64))
        xv = (x.hi[cols].astype(jnp.float64)
              + x.lo[cols].astype(jnp.float64))
        t64 = jax.ops.segment_sum(cv * xv, rows, num_segments=lo_.n)
        t_hi = t64.astype(x.hi.dtype)
        t_lo = (t64 - t_hi.astype(jnp.float64)).astype(x.hi.dtype)
        y = df_add(y, DF(t_hi, t_lo))
    return y
