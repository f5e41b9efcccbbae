"""Scatter-free reduction: precomputed padded gather maps.

TPU scatters (what ``segment_sum`` lowers to) run at ~1e8 updates/s —
orders of magnitude below gather/einsum bandwidth — so the assembly's
"scatter contributions into COO slots" step is inverted at setup time:
for every output slot we precompute the (padded, capped) list of
contribution indices, and the runtime reduction becomes

    out[s] = sum_k data_padded[gmap[s, k]]

— pure gathers + a small dense sum, running at HBM bandwidth.  Slots with
more than ``cap`` contributions (e.g. diagonal pairs at high-valence
vertices of tet meshes) spill into a small overflow COO handled by one
ordinary segment_sum; the overflow is a few percent of contributions, so
its scatter cost is negligible.  The reduction stays deterministic
(fixed summation order), unlike the reference's atomics
(solver/06_FEM_Kernel.jl).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GatherReduce:
    """Holds HOST (numpy) index maps — they may be built inside a jit
    trace (lazily, at first trace) and are re-lifted as constants by every
    trace that applies them, so no tracers can leak across traces."""
    num: int                      # number of output slots
    n_data: int                   # contribution count (sentinel index)
    gmap: np.ndarray              # [num, cap] int32, sentinel = n_data
    overflow_src: Optional[np.ndarray]   # [n_of] int32 into data
    overflow_dst: Optional[np.ndarray]   # [n_of] int32 slot ids

    def __call__(self, data: jnp.ndarray) -> jnp.ndarray:
        padded = jnp.concatenate(
            [data, jnp.zeros(1, dtype=data.dtype)])
        # column-wise 1-D gathers (a [num, cap] 2-D gather would be tiled
        # to (8,128) on TPU, padding cap up to 128 — see maps_to_device)
        out = padded[self.gmap[:, 0]]
        for k in range(1, self.gmap.shape[1]):
            out = out + padded[self.gmap[:, k]]
        if self.overflow_src is not None:
            out = out + jax.ops.segment_sum(
                data[self.overflow_src], self.overflow_dst,
                num_segments=self.num)
        return out


def build_gather_reduce(slots: np.ndarray, num: int,
                        cap: int = 8) -> GatherReduce:
    """Invert a contribution->slot map.  ``slots``: [N] target slot per
    contribution (all in [0, num))."""
    from ..native import invert_map
    slots = np.asarray(slots)
    gmap, of_src, of_dst, _k = invert_map(slots, num, cap)
    return GatherReduce(num=num, n_data=slots.size, gmap=gmap,
                        overflow_src=of_src, overflow_dst=of_dst)


def build_compact_gather_reduce(slots: np.ndarray, num: int,
                                cap: int = 8,
                                compact_threshold: float = 0.2):
    """Like build_gather_reduce, but when the touched slots are a small
    fraction of ``num`` (e.g. boundary-only nonlinear tangent blocks), the
    reduction runs over the compact touched set and is expanded to full
    size by one tiny scatter — instead of iterating every output slot.

    Returns (GatherReduce over compact slots, touched np.ndarray | None).
    ``touched is None`` means the map is full-size."""
    slots = np.asarray(slots)
    # O(N) touched-set detection (np.unique would sort 1e8+ entries).
    # Rank via searchsorted on the touched list — NOT a num-length
    # cumsum: np.cumsum over tens of millions of entries measured
    # 5-60 s on this host's single slow core.
    counts = np.bincount(slots, minlength=num)
    touched = np.flatnonzero(counts)
    n_touched = touched.size
    if n_touched > compact_threshold * num:
        return build_gather_reduce(slots, num, cap), None
    compact = np.searchsorted(touched, slots)
    return build_gather_reduce(compact, n_touched, cap), touched


def maps_to_device(gr: Optional[GatherReduce]) -> Optional[dict]:
    """Upload a GatherReduce's index arrays once; passing them through the
    state pytree keeps them out of the compiled program's constants (which
    would otherwise ship hundreds of MB through every compile).

    Layout note: the map is stored FLAT (column-major, [cap * num]) so
    every runtime access is a 1-D gather — a 2-D [num, cap] int32 array
    would be tiled to (8, 128) on TPU, padding the tiny cap axis to 128
    (observed 64x HBM blowup, 7 GB for a 115 MB map)."""
    if gr is None:
        return None
    out = {"gmap_flat": jnp.asarray(np.ascontiguousarray(
        gr.gmap.T).reshape(-1))}
    if gr.overflow_src is not None:
        out["of_src"] = jnp.asarray(gr.overflow_src)
        out["of_dst"] = jnp.asarray(gr.overflow_dst)
    return out


def apply_device_maps(maps: Optional[dict], data: jnp.ndarray,
                      num: int) -> jnp.ndarray:
    if maps is None:
        return jnp.zeros(num, data.dtype)
    padded = jnp.concatenate([data, jnp.zeros(1, dtype=data.dtype)])
    gmap_flat = maps["gmap_flat"]
    n = num
    cap = gmap_flat.shape[0] // n     # static under trace
    out = padded[gmap_flat[0:n]]
    for k in range(1, cap):
        out = out + padded[gmap_flat[k * n:(k + 1) * n]]
    if "of_src" in maps:
        out = out + jax.ops.segment_sum(data[maps["of_src"]],
                                        maps["of_dst"], num_segments=num)
    return out


def apply_device_maps_df(maps: Optional[dict], data, num: int):
    """Two-float variant of apply_device_maps: ``data`` is a DF pair of
    contribution values; the per-slot cap-term sum is two_sum-compensated
    (each slot's contributions may cancel — a plain f32 sum here would
    reintroduce the f32 assembly floor the DF path exists to remove).
    The small overflow tail reduces through one f64 segment_sum."""
    from ..linsolve import twofloat as tf
    if maps is None:
        z = jnp.zeros(num, jnp.float32)
        return tf.DF(z, z)
    pad_hi = jnp.concatenate([data.hi, jnp.zeros(1, jnp.float32)])
    pad_lo = jnp.concatenate([data.lo, jnp.zeros(1, jnp.float32)])
    gmap_flat = maps["gmap_flat"]
    n = num
    cap = gmap_flat.shape[0] // n
    idx = gmap_flat[0:n]
    s, c = pad_hi[idx], pad_lo[idx]
    for k in range(1, cap):
        idx = gmap_flat[k * n:(k + 1) * n]
        s, e = tf.two_sum(s, pad_hi[idx])
        c = c + (e + pad_lo[idx])
    out = tf.df_normalize(s, c)
    if "of_src" in maps:
        v64 = (data.hi[maps["of_src"]].astype(jnp.float64)
               + data.lo[maps["of_src"]].astype(jnp.float64))
        t64 = jax.ops.segment_sum(v64, maps["of_dst"], num_segments=num)
        t_hi = t64.astype(jnp.float32)
        t_lo = (t64 - t_hi.astype(jnp.float64)).astype(jnp.float32)
        out = tf.df_add(out, tf.DF(t_hi, t_lo))
    return out
