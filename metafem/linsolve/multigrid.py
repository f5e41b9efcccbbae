"""Lattice geometric multigrid — the TPU-native strong preconditioner.

The reference's only strong preconditioner is ILU(0)
(src/solver/linear_solver/02_Preconditioner.jl:179-193), whose sequential
triangular solves are hostile to TPU.  Jacobi / polynomial substitutes
(precond.py, poly.py) cap the achievable convergence: at 1M DOF the FEM
tangent has condition number ~h^-2 ~ 1e6 and Jacobi-preconditioned Krylov
stalls (PERFORMANCE.md).  This module supplies the capability the
reference gets from ILU — an O(N) approximate inverse — in the form that
actually fits the hardware: geometric multigrid on the control-point
lattice.

Why this is TPU-idiomatic: with lattice control-point numbering
(mesh/fem_mesh.py) the tangent is a variable-coefficient *stencil*
(block-offset storage, block_offset.py).  Every multigrid ingredient then
lowers to dense strided slicing — no gathers, no scatters:

- **Restriction / prolongation**: separable per-axis linear interpolation
  between a lattice and its every-other-point sublattice; implemented
  with strided slices + interleave, exact adjoints of each other.
- **Galerkin coarse operators**: built *numerically by probing*.  The
  coarse operator ``T = R A P`` is again a stencil of per-axis radius
  ``r_c = (r_A + 2) // 2``.  Applying ``T`` to comb vectors (indicator of
  lattice points with coords ≡ c mod m, ``m = 2 r_c + 1``) reads off
  every stencil coefficient exactly: within any radius-``r_c`` window the
  congruence class identifies the offset uniquely.  ``m^dim × channels``
  operator applications per level — no symbolic RAP, works for any PDE,
  any channel coupling, and recursively for all levels.
- **Smoother**: damped point-Jacobi with the damping factor from a
  power-iteration estimate of rho(D^-1 A) per level (4/3 / rho damps the
  oscillatory half of the spectrum).  Ghost lattice rows carry a unit
  diagonal (domain regularization) and smooth trivially.
- **Coarsest level**: the stencil is materialized into a dense matrix
  (static scatter indices) and LU-factorized once per setup — a few-k×
  few-k dense solve on the MXU per V-cycle.

The whole V-cycle is one jitted linear operator, used as a *right*
preconditioner for the nonsymmetric Krylov menu (krylov.py):
``solve(A∘M) then x = M y`` — residual norms are unchanged by right
preconditioning so the existing stopping tests stay valid.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_offset import OffsetMatrix


# ---------------------------------------------------------------------------
# static hierarchy description
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MGHierarchy:
    """Static (hashable) description of the multigrid hierarchy."""
    dim: int
    channels: int
    shapes: Tuple[Tuple[int, ...], ...]   # level 0 = fine lattice
    radius: int                           # stencil radius at levels >= 1
    offsets: Tuple[Tuple[int, ...], ...]  # all offsets within radius
    nu1: int = 2
    nu2: int = 2
    n_power: int = 10
    #: couple the channels in the smoother: damped BLOCK-Jacobi with the
    #: per-node C x C channel blocks inverted at setup.  Pointwise
    #: (scalar) Jacobi ignores the inter-field coupling and diverges on
    #: saddle-point-like systems (stabilized equal-order u-p: the
    #: pressure diagonal is only the small PSPG term); the node-block
    #: smoother is the standard remedy (Vanka-lite).
    block_smooth: bool = False

    @property
    def n_levels(self) -> int:
        return len(self.shapes)

    @property
    def m(self) -> int:                   # colors per axis for probing
        return 2 * self.radius + 1


def _coarse_shape(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    return tuple((s + 1) // 2 for s in shape)


def decompose_offsets(flat_offsets: np.ndarray,
                      shape: Tuple[int, ...]) -> Optional[np.ndarray]:
    """Decompose flat row-major offsets d = sum_a k_a * stride_a into
    per-axis steps k (nearest decomposition).  Returns [n, dim] or None
    if any offset fails to reconstruct (|k_a| must stay < shape[a]/2)."""
    d = np.asarray(flat_offsets, dtype=np.int64).copy()
    strides = np.cumprod((1,) + shape[:0:-1])[::-1]     # row-major
    ks = np.zeros((d.size, len(shape)), dtype=np.int64)
    for a, stride in enumerate(strides):
        k = np.floor_divide(d + stride // 2, stride)    # round to nearest
        ks[:, a] = k
        d = d - k * stride
    if (d != 0).any():
        return None
    for a, s in enumerate(shape):
        if (np.abs(ks[:, a]) * 2 >= s).any():
            return None
    return ks


def build_hierarchy(lattice_shape: Tuple[int, ...], channels: int,
                    fine_radius: int, max_coarse: int = 2048,
                    max_levels: int = 16, nu1: int = 2, nu2: int = 2,
                    n_power: int = 10,
                    block_smooth: bool = False) -> MGHierarchy:
    """Coarsen by 2 per axis until the dense-solve level is small."""
    r_c = max(2, (fine_radius + 2) // 2)
    shapes = [tuple(lattice_shape)]
    while len(shapes) < max_levels:
        nxt = _coarse_shape(shapes[-1])
        if any(n < 3 for n in nxt) or nxt == shapes[-1]:
            break
        shapes.append(nxt)
        if channels * int(np.prod(nxt)) <= max_coarse:
            break
    if len(shapes) < 2:
        raise ValueError("multigrid: lattice too small to coarsen — use a "
                         "direct or Jacobi-preconditioned solve instead")
    offsets = tuple(itertools.product(range(-r_c, r_c + 1),
                                      repeat=len(lattice_shape)))
    return MGHierarchy(dim=len(lattice_shape), channels=channels,
                      shapes=tuple(shapes), radius=r_c, offsets=offsets,
                      nu1=nu1, nu2=nu2, n_power=n_power,
                      block_smooth=block_smooth)


def mask_for_domain(domain):
    """Occupancy mask [n_cp] (1.0 real / 0.0 ghost) for the single
    lattice workpiece, or None when every lattice slot is occupied.
    Ghost slots carry a unit-diagonal regularizer of sign opposite to
    the (typically negative-definite) PDE block; transfers must not mix
    the two subspaces or the Galerkin coarse operator goes indefinite
    and the V-cycle amplifies — so prolongation/restriction are masked
    to the occupied subspace (P' = M P)."""
    mesh = domain.workpieces[0].mesh
    occ = mesh.is_occupied
    if occ is None or occ.all():
        return None
    return jnp.asarray(occ.astype(np.float64), dtype=domain.dtype)


def hierarchy_for_domain(domain, **kwargs) -> MGHierarchy:
    """Build the hierarchy from a compiled FEM_Domain (single lattice
    workpiece).  Raises with a clear message when not applicable."""
    if len(domain.workpieces) != 1:
        raise ValueError("multigrid preconditioner: single-workpiece "
                         "domains only (got %d)" % len(domain.workpieces))
    mesh = domain.workpieces[0].mesh
    if mesh.lattice_shape is None:
        raise ValueError("multigrid preconditioner requires lattice "
                         "control-point numbering (structured mesh); this "
                         "mesh did not qualify — use precond='jacobi'")
    pattern = domain.pattern
    n_cp = mesh.n_cp
    # all cp-pair offsets present in the sparsity (dense segments + tail)
    d_cp = np.unique((pattern.coo_cols.astype(np.int64) % n_cp)
                     - (pattern.coo_rows.astype(np.int64) % n_cp))
    ks = decompose_offsets(d_cp, mesh.lattice_shape)
    if ks is None:
        raise ValueError("multigrid preconditioner: sparsity offsets do "
                         "not decompose on the lattice")
    fine_radius = int(np.abs(ks).max())
    n_vars = pattern.wp_infos[0].n_vars
    assert pattern.basicfield_size == n_vars * n_cp
    return build_hierarchy(mesh.lattice_shape, n_vars, fine_radius,
                           **kwargs)


# ---------------------------------------------------------------------------
# transfer operators (separable, strided slices; exact adjoints)
# ---------------------------------------------------------------------------

def _p_axis(c: jnp.ndarray, s_fine: int) -> jnp.ndarray:
    """Linear prolongation along the last axis: [..., Sc] -> [..., S].
    out[2j] = c[j]; out[2j+1] = (c[j] + c[j+1]) / 2 (c zero-padded)."""
    n_odd = s_fine // 2
    pad = [(0, 0)] * (c.ndim - 1) + [(0, 1)]
    cpad = jnp.pad(c, pad)
    odd = 0.5 * (c[..., :n_odd] + cpad[..., 1:n_odd + 1])
    pairs = jnp.stack([c[..., :n_odd], odd], axis=-1)
    out = pairs.reshape(c.shape[:-1] + (2 * n_odd,))
    if s_fine % 2:
        out = jnp.concatenate([out, c[..., -1:]], axis=-1)
    return out


def _r_axis(r: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of _p_axis along the last axis: [..., S] -> [..., Sc]."""
    s_fine = r.shape[-1]
    sc = (s_fine + 1) // 2
    even = r[..., ::2]                      # [..., sc]
    odd = r[..., 1::2]                      # [..., S//2]
    n_odd = odd.shape[-1]
    pad_r = [(0, 0)] * (r.ndim - 1) + [(0, sc - n_odd)]
    term1 = jnp.pad(odd, pad_r)
    pad_l = [(0, 0)] * (r.ndim - 1) + [(1, 0)]
    term2 = jnp.pad(odd, pad_l)[..., :sc]
    return even + 0.5 * (term1 + term2)


def prolong(xc: jnp.ndarray, fine_shape: Tuple[int, ...]) -> jnp.ndarray:
    """[C, *Sc] -> [C, *S] separable per-axis linear interpolation."""
    x = xc
    for a, s in enumerate(fine_shape):
        x = jnp.moveaxis(_p_axis(jnp.moveaxis(x, a + 1, -1), s), -1, a + 1)
    return x


def restrict(xf: jnp.ndarray) -> jnp.ndarray:
    """[C, *S] -> [C, *Sc]; exact adjoint of prolong."""
    x = xf
    for a in range(x.ndim - 1):
        x = jnp.moveaxis(_r_axis(jnp.moveaxis(x, a + 1, -1)), -1, a + 1)
    return x


# ---------------------------------------------------------------------------
# stencil operator application (levels >= 1)
# ---------------------------------------------------------------------------

def _stencil_mv(coefs: jnp.ndarray, x: jnp.ndarray,
                offsets: Tuple[Tuple[int, ...], ...],
                radius: int) -> jnp.ndarray:
    """y[ci, r] = sum_{o, cj} coefs[o, ci, cj, r] * x[cj, r + o].

    coefs: [n_off, C, C, *S]; x: [C, *S].  Pure shifted multiply-adds on
    dense arrays (pad + static slice) — HBM-bandwidth work, no gathers."""
    C = x.shape[0]
    spatial = x.shape[1:]
    pad = [(0, 0)] + [(radius, radius)] * len(spatial)
    xp = jnp.pad(x, pad)
    y = jnp.zeros_like(x)
    for i, off in enumerate(offsets):
        sl = tuple(slice(radius + o, radius + o + s)
                   for o, s in zip(off, spatial))
        xs = xp[(slice(None),) + sl]                       # [C, *S]
        y = y + jnp.einsum("ij...,j...->i...", coefs[i], xs)
    return y


def _stencil_diag(coefs: jnp.ndarray, offsets, C: int) -> jnp.ndarray:
    i0 = offsets.index(tuple([0] * (coefs.ndim - 3)))
    d0 = coefs[i0]                                          # [C, C, *S]
    return jnp.stack([d0[c, c] for c in range(C)])          # [C, *S]


def _stencil_to_dense(coefs: jnp.ndarray, shape: Tuple[int, ...],
                      offsets, C: int) -> jnp.ndarray:
    """Materialize the coarsest stencil as a dense [N, N] matrix using
    statically precomputed scatter indices (flat dof = c*P + lattice)."""
    P = int(np.prod(shape))
    N = C * P
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    flat = np.zeros(shape, dtype=np.int64)
    for g, s in zip(grids, np.cumprod((1,) + shape[:0:-1])[::-1]):
        flat = flat + g * s
    rows_l, cols_l, oi_l, ci_l, cj_l = [], [], [], [], []
    for i, off in enumerate(offsets):
        ok = np.ones(shape, dtype=bool)
        for a, o in enumerate(off):
            idx = grids[a] + o
            ok &= (idx >= 0) & (idx < shape[a])
        r = flat[ok]
        stride = np.cumprod((1,) + shape[:0:-1])[::-1]
        c = r + sum(o * s for o, s in zip(off, stride))
        for ci in range(C):
            for cj in range(C):
                rows_l.append(ci * P + r)
                cols_l.append(cj * P + c)
                oi_l.append(np.full(r.size, i))
                ci_l.append(np.full(r.size, ci))
                cj_l.append(np.full(r.size, cj))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    # gather the coefficient values: coefs[oi, ci, cj, flat spatial]
    oi = np.concatenate(oi_l)
    ci = np.concatenate(ci_l)
    cj = np.concatenate(cj_l)
    sp = np.concatenate([rows_l[k] % P for k in range(len(rows_l))])
    vals = coefs.reshape(coefs.shape[:3] + (P,))[oi, ci, cj, sp]
    dense = jnp.zeros((N, N), coefs.dtype).at[rows, cols].add(vals)
    return dense


# ---------------------------------------------------------------------------
# setup: probing + smoother calibration + coarsest factorization
# ---------------------------------------------------------------------------

def _apply_level(hier: MGHierarchy, state, level: int,
                 x: jnp.ndarray) -> jnp.ndarray:
    """Apply the level operator to x [C, *S_level]."""
    if level == 0 and "A" in state[0]:
        A: OffsetMatrix = state[0]["A"]
        return A.mv(x.reshape(-1)).reshape(x.shape)
    return _stencil_mv(state[level]["coefs"], x, hier.offsets, hier.radius)


def _color_index(shape: Tuple[int, ...], off: Tuple[int, ...],
                 m: int) -> jnp.ndarray:
    """Color id of (r + off) mod m at each point r.  Computed on-device
    from iota — at 1M DOF these index fields are megabytes per offset
    per level, and baking them in as program constants chokes remote
    compilation (the transport constant-size limit, PERFORMANCE.md)."""
    idx = jnp.zeros(shape, dtype=jnp.int32)
    for a, o in enumerate(off):
        g = jax.lax.broadcasted_iota(jnp.int32, shape, a)
        idx = idx * m + ((g + o) % m)
    return idx


def _masked_prolong(hier, state, level, xc):
    """P' v = M_level P v: prolong to ``level``, zero ghost slots."""
    x = prolong(xc, hier.shapes[level])
    mask = state[level].get("mask")
    return x if mask is None else x * mask


def _masked_restrict(hier, state, level, xf):
    """R' r = P'^T r = restrict(M_level r) (exact adjoint of above)."""
    mask = state[level].get("mask")
    return restrict(xf if mask is None else xf * mask)


def _probe_level(hier: MGHierarchy, state, level: int,
                 dtype) -> jnp.ndarray:
    """Galerkin coarse stencil for ``level+1`` by probing R A_level P."""
    C, m = hier.channels, hier.m
    s_coarse = hier.shapes[level + 1]
    colors = list(itertools.product(range(m), repeat=hier.dim))
    n_colors = len(colors)

    # comb vectors on the coarse lattice, one per (channel, color);
    # built on-device from iota (no large program constants — see
    # _color_index).  cid[r] = color id of point r; comb k = (cid == k).
    cid = _color_index(s_coarse, (0,) * hier.dim, m)      # [*Sc]
    col_ids = jnp.arange(n_colors, dtype=jnp.int32).reshape(
        (n_colors,) + (1,) * hier.dim)
    combs = (cid[None] == col_ids).astype(dtype)          # [ncol, *Sc]

    def probe_one(v_coarse):                              # [C, *Sc]
        return _masked_restrict(
            hier, state, level,
            _apply_level(hier, state, level,
                         _masked_prolong(hier, state, level, v_coarse)))

    # batch over (channel cj, color): build [C*ncol, C, *Sc] inputs.
    # Batched lax.map, NOT a full vmap: each probe materializes
    # ~n_off live fine-lattice temporaries, so a full 125-color vmap in
    # 3D at 1.4M fine points needs ~48 GB HBM (measured OOM); cap the
    # probe batch so batch * n_off * fine <= ~100M floats.
    fine = int(np.prod(hier.shapes[level])) * C
    batch = max(1, min(C * n_colors,
                       int(1e8 // max(1, len(hier.offsets) * fine))
                       or 1))
    eye = jnp.eye(C, dtype=dtype)                         # [C, C]
    probes = jnp.einsum("jc,k...->jkc...", eye, combs)    # [Cj,ncol,C,*Sc]
    probes = probes.reshape((C * n_colors, C) + s_coarse)
    t_all = jax.lax.map(probe_one, probes, batch_size=batch)
    t_all = t_all.reshape((C, n_colors, C) + s_coarse)    # [Cj,ncol,Ci,*Sc]

    # flatten the spatial axes before the gather: take_along_axis on the
    # 6D [C,1,C,*Sc] shape forces a T(1,128) layout padded up to 128x
    # (measured 90 MB per 0.7 MB slice in 3D — OOM at setup)
    Pc = int(np.prod(s_coarse))
    t_flat = t_all.reshape(C, n_colors, C, Pc)
    coef_list = []
    for off in hier.offsets:
        cidx = _color_index(s_coarse, off, m).reshape(-1)   # [Pc]
        sel = jnp.take_along_axis(
            t_flat, cidx[None, None, None, :].astype(jnp.int32), axis=1
        )[:, 0]                                            # [Cj, Ci, Pc]
        coef_list.append(jnp.swapaxes(sel, 0, 1))          # [Ci, Cj, Pc]
    return jnp.stack(coef_list).reshape(
        (len(hier.offsets), C, C) + s_coarse)


def _calibrate(hier, state, level, dtype):
    """Power-iteration estimate of rho(D^-1 A); damped-Jacobi omega."""
    shape = (hier.channels,) + hier.shapes[level]
    v = jax.random.normal(jax.random.PRNGKey(3 + level), shape, dtype)
    v = v / jnp.linalg.norm(v)

    def body(v, _):
        w = _diag_solve(state[level],
                        _apply_level(hier, state, level, v))
        lam = jnp.linalg.norm(w)
        return w / jnp.where(lam == 0, 1.0, lam), lam

    v, lams = jax.lax.scan(body, v, None, length=hier.n_power)
    lam = lams[-1] * 1.1                   # safety headroom
    return (4.0 / 3.0) / jnp.where(lam == 0, 1.0, lam)


def _safe_inv(d):
    return jnp.where(d == 0, 0.0, 1.0 / jnp.where(d == 0, 1.0, d))


def _floored_inv(d):
    """Jacobi inverse with a relative magnitude floor: entries below
    1e-6x the median nonzero magnitude are clamped (sign kept) so the
    smoother never multiplies a residual by 1e7+ at near-null points
    (graded-mesh aux lattices produce these; see _setup_coarser_levels).
    Exact zeros (ghost slots handled elsewhere) stay zero."""
    a = jnp.abs(d)
    med = jnp.nanmedian(jnp.where(a == 0, jnp.nan, a))
    med = jnp.where(jnp.isnan(med), 1.0, med)
    floor = 1e-6 * med
    sgn = jnp.where(d < 0, -1.0, 1.0).astype(d.dtype)
    df = jnp.where((a > 0) & (a < floor), sgn * floor, d)
    return _safe_inv(df)


def _fine_diag_blocks(A: OffsetMatrix, C: int,
                      shape: Tuple[int, ...]) -> jnp.ndarray:
    """Same-node channel-coupling blocks [C, C, *S] of the fine operator,
    read directly from the d=0 dense segments (one per variable-pair
    unit — the layout always stores the in-block diagonal densely,
    block_offset.build_offset_layout; absent pairs are zero)."""
    lo = A.layout
    grp = lo.pallas_groups[0]
    n_cp = grp.n_cp
    blocks = [[None] * C for _ in range(C)]
    for (row0, col0, ncp_s, d, b) in lo.segments:
        if d != 0:
            continue
        pd = (row0 - grp.dof_offset) // n_cp
        pb = (col0 - grp.dof_offset) // n_cp
        blocks[pd][pb] = A.vals[b:b + n_cp]
    z = jnp.zeros(n_cp, A.vals.dtype)
    M = jnp.stack([jnp.stack([blocks[i][j] if blocks[i][j] is not None
                              else z for j in range(C)])
                   for i in range(C)])
    return M.reshape((C, C) + shape)


def _inv_blocks(M: jnp.ndarray, C: int) -> jnp.ndarray:
    """Per-node inverse of [C, C, *S] blocks (all-zero diagonal entries
    — ghost slots without a unit regularizer — are set to 1 first)."""
    S = M.shape[2:]
    P = int(np.prod(S))
    Mp = jnp.moveaxis(M.reshape(C, C, P), -1, 0)        # [P, C, C]
    dg = jnp.diagonal(Mp, axis1=1, axis2=2)             # [P, C]
    fix = jnp.where(dg == 0, 1.0, 0.0).astype(M.dtype)
    Mp = Mp + fix[:, :, None] * jnp.eye(C, dtype=M.dtype)[None]
    inv = jnp.linalg.inv(Mp)
    return jnp.moveaxis(inv, 0, -1).reshape((C, C) + S)


def _diag_solve(state_level: dict, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the smoother's (approximate) D^-1: channel-block inverse
    when built, pointwise inverse diagonal otherwise."""
    blk = state_level.get("inv_diag_blk")
    if blk is not None:
        return jnp.einsum("ij...,j...->i...", blk, v)
    return state_level["inv_diag"] * v


def mg_setup(hier: MGHierarchy, A: OffsetMatrix,
             mask: Optional[jnp.ndarray] = None) -> tuple:
    """Build the jittable V-cycle state (a pytree) from the assembled
    fine operator.  Called once per tangent (per Newton iteration).

    ``mask``: flat [n_cp] occupancy (1.0 real / 0.0 ghost) or None; see
    mask_for_domain.  Coarser masks are formed by injection (a coarse
    point is real iff its co-located fine point is)."""
    dtype = A.vals.dtype
    C = hier.channels
    state: List[dict] = [{"A": A}]
    if mask is not None:
        # only level 0 has a ghost subspace; coarser (Galerkin) operators
        # are built from masked transfers and live in the real subspace.
        # A coarse point whose injection site is a fine ghost still
        # carries a legitimate (masked-hat) basis function.
        state[0]["mask"] = mask.reshape((1,) + hier.shapes[0]).astype(dtype)
    d0 = A.diag().reshape((C,) + hier.shapes[0])
    state[0]["inv_diag"] = _safe_inv(d0)
    if hier.block_smooth and C > 1:
        state[0]["inv_diag_blk"] = _inv_blocks(
            _fine_diag_blocks(A, C, hier.shapes[0]), C)
    state[0]["omega"] = _calibrate(hier, state, 0, dtype)

    return _setup_coarser_levels(hier, state, dtype)


def _setup_coarser_levels(hier: MGHierarchy, state: List[dict],
                          dtype) -> tuple:
    """Probe levels 1.. from an initialized level-0 entry and factor the
    coarsest level (shared by mg_setup and mg_setup_from_stencil)."""
    C = hier.channels
    i0 = list(hier.offsets).index((0,) * hier.dim)
    for level in range(1, hier.n_levels):
        coefs = _probe_level(hier, state, level - 1, dtype)
        entry = {"coefs": coefs,
                 "inv_diag": _floored_inv(
                     _stencil_diag(coefs, list(hier.offsets), C))}
        if hier.block_smooth and C > 1:
            entry["inv_diag_blk"] = _inv_blocks(coefs[i0], C)
        state.append(entry)
        if level < hier.n_levels - 1:
            entry["omega"] = _calibrate(hier, state, level, dtype)

    # coarsest: dense solve (regularize all-zero rows to identity).  The
    # inverse is materialized at setup so the per-V-cycle coarse solve is
    # ONE dense matvec on the MXU — an lu_solve here would run two
    # sequential triangular solves per cycle, the TPU-hostile pattern
    # this framework avoids everywhere (see poly.py on ILU).
    last = hier.n_levels - 1
    dense = _stencil_to_dense(state[last]["coefs"], hier.shapes[last],
                              list(hier.offsets), C)
    diag = jnp.diagonal(dense)
    dense = dense + jnp.diag(jnp.where(diag == 0, 1.0, 0.0).astype(dtype))
    # Regularized inverse: under mesh grading the Galerkin coarse
    # operator carries a continuum of near-null rows (aux-lattice points
    # supported only by tiny elements or interpolation tails); a plain
    # inverse then has norm 1e12+ and its cancellation noise (eps*||inv||)
    # swamps the V-cycle.  Equilibrate (sqrt-|diag| Jacobi, making the
    # diagonal +-1) and shift by 1e-6 toward the dominant diagonal sign:
    # caps ||inv|| at ~1e6 in the equilibrated metric while perturbing
    # healthy directions by only ~1e-6 relative.  The truncated
    # directions effectively get no coarse correction, which the
    # smoother and the outer Krylov absorb.  (An SVD cutoff is cleaner
    # but this function must stay TPU-compilable — it runs inside jitted
    # steps, jit_step.py — and jnp SVD crashes the TPU XLA pipeline.)
    s = _safe_inv(jnp.sqrt(jnp.abs(jnp.diagonal(dense))))
    s = jnp.where(s == 0, 1.0, s)
    B = s[:, None] * dense * s[None, :]
    sgn = jnp.sign(jnp.sum(jnp.sign(jnp.diagonal(B))))
    sgn = jnp.where(sgn == 0, 1.0, sgn).astype(dtype)
    B = B + (1e-6 * sgn) * jnp.eye(B.shape[0], dtype=dtype)
    state[last]["inv"] = s[:, None] * jnp.linalg.inv(B) * s[None, :]
    return tuple(state)


def mg_setup_from_stencil(hier: MGHierarchy, coefs0: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None) -> tuple:
    """Build the V-cycle state when the FINEST level is already a lattice
    stencil (``coefs0`` [n_off, C, C, *shapes[0]]) rather than an
    assembled OffsetMatrix — the auxiliary-space path (auxmg.py) seeds
    the hierarchy with the host-Galerkin aux-lattice operator."""
    dtype = coefs0.dtype
    C = hier.channels
    state: List[dict] = [{"coefs": coefs0}]
    if mask is not None:
        state[0]["mask"] = mask.reshape((1,) + hier.shapes[0]).astype(dtype)
    state[0]["inv_diag"] = _floored_inv(
        _stencil_diag(coefs0, list(hier.offsets), C))
    if hier.block_smooth and C > 1:
        i0 = list(hier.offsets).index((0,) * hier.dim)
        state[0]["inv_diag_blk"] = _inv_blocks(coefs0[i0], C)
    state[0]["omega"] = _calibrate(hier, state, 0, dtype)
    return _setup_coarser_levels(hier, state, dtype)


# ---------------------------------------------------------------------------
# the V-cycle
# ---------------------------------------------------------------------------

def _smooth(hier, state, level, x, b, n):
    om = state[level]["omega"]
    for _ in range(n):
        x = x + om * _diag_solve(
            state[level], b - _apply_level(hier, state, level, x))
    return x


def _vcycle_level(hier, state, level, b):
    if level == hier.n_levels - 1:
        x = state[level]["inv"] @ b.reshape(-1)
        return x.reshape(b.shape)
    om = state[level]["omega"]
    x = om * _diag_solve(state[level], b)
    x = _smooth(hier, state, level, x, b, hier.nu1 - 1)
    r = b - _apply_level(hier, state, level, x)
    xc = _vcycle_level(hier, state, level + 1,
                       _masked_restrict(hier, state, level, r))
    x = x + _masked_prolong(hier, state, level, xc)
    return _smooth(hier, state, level, x, b, hier.nu2)


def vcycle(hier: MGHierarchy, state: tuple, b: jnp.ndarray) -> jnp.ndarray:
    """One V(nu1, nu2) cycle on the flat residual vector: M b ~= A^-1 b."""
    shape = (hier.channels,) + hier.shapes[0]
    return _vcycle_level(hier, state, 0, b.reshape(shape)).reshape(-1)


# ---------------------------------------------------------------------------
# Krylov integration: right-preconditioned operator
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MGOperator:
    """A ∘ M as a matrix-like operator for the Krylov menu: solve
    (A M) y = b with any krylov.* solver, then x = M y (vcycle)."""
    A: OffsetMatrix
    state: tuple
    hier: MGHierarchy                     # static

    def tree_flatten(self):
        return (self.A, self.state), (self.hier,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    def mv(self, v: jnp.ndarray) -> jnp.ndarray:
        return self.A.mv(vcycle(self.hier, self.state, v))

    def apply_m(self, y: jnp.ndarray) -> jnp.ndarray:
        return vcycle(self.hier, self.state, y)


def _auto_chunk(n_dof: int, n_iter: int) -> int:
    """Operator applications per device dispatch for the setup scans.
    The remote-device transport wedges (TPU worker crash) on dispatches
    past ~1 minute; at production sizes one preconditioned apply is
    1-100 ms, so a whole n_iter scan in one dispatch is fine below
    ~400k DOF and must be split above it."""
    return n_iter if n_dof < 400_000 else 4


def estimate_spectrum(op, n_dof: int, dtype, n_iter: int = 24,
                      seed: int = 11, chunk: int = None) -> tuple:
    """(lam_min, lam_max) estimate for the MG-preconditioned operator
    A·M by two power iterations: lam_max directly, lam_min through the
    shifted operator s·I - A·M (s slightly above lam_max).  One-time
    setup cost (~2*n_iter operator applies); Chebyshev inner solves
    (krylov.chebyshev) take this as their spectrum enclosure.  A single
    symmetric bound [1-rho, 1+rho] from the error-operator radius is NOT
    enough: penalty boundary rows leave isolated outlier eigenvalues
    (measured radius 1.18 on a clean 2D thermal lattice), and an
    enclosure containing 0 diverges Chebyshev — the edges must be
    measured separately.

    ``chunk``: iterations per device dispatch (default: _auto_chunk) —
    the scan is split into host-level calls carrying (v, lam) on the
    device, so no dispatch exceeds ``chunk`` operator applications."""
    if chunk is None:
        chunk = _auto_chunk(n_dof, n_iter)
    chunk = max(1, min(chunk, n_iter))
    n_calls = -(-n_iter // chunk)

    # ONE compiled program for both edges: u = alpha*v + beta*A.mv(v)
    # with (alpha, beta) traced — (0, 1) gives lam_max, (s, -1) the
    # shifted operator for lam_min.  XLA compiles dominate setup on
    # this host (each V-cycle program is seconds of backend compile),
    # so constants that vary between calls must be arguments.
    @jax.jit
    def run(op, v, lam, alpha, beta):
        def body(c, _):
            v, _ = c
            u = alpha * v + beta * op.mv(v)
            lam = jnp.linalg.norm(u)
            # power iteration tracks |lambda|
            return (u / jnp.where(lam == 0, 1.0, lam), lam), None

        (v, lam), _ = jax.lax.scan(body, (v, lam), None, length=chunk)
        return v, lam

    def power(alpha, beta):
        v = jax.random.normal(jax.random.PRNGKey(seed), (n_dof,), dtype)
        v = v / jnp.linalg.norm(v)
        lam = jnp.asarray(0.0, dtype)
        for _ in range(n_calls):
            v, lam = run(op, v, lam, alpha, beta)
            jax.block_until_ready(lam)      # bound in-flight work
        return float(lam)

    zero = jnp.asarray(0.0, dtype)
    one = jnp.asarray(1.0, dtype)
    lam_max = power(zero, one)
    s = 1.05 * lam_max
    lam_min = s - power(jnp.asarray(s, dtype), -one)
    return lam_min, lam_max


def tune_chebyshev(op, n_dof: int, dtype, spectrum,
                   n_iter: int = 16, seed: int = 5, chunk: int = None):
    """(interval, measured_rate) for Chebyshev inner solves on A·M.

    Power-iteration edge estimates are systematically optimistic when
    the preconditioned modes cluster: a true eigenvalue BELOW the
    estimated lower edge sits where the Chebyshev polynomial grows, so
    the trial solve first contracts at the predicted rate and then
    saturates (measured: rate 0.71 over 8 iters that stalls at ~0.3
    reduction per solve).  The fix is empirical: scan a few lower-edge
    candidates, measure the ACTUAL reduction of an n_iter-trip solve on
    each (long enough to expose saturation), keep the best.

    ``chunk``: recurrence iterations per device dispatch (default
    _auto_chunk) — the trial solves run as host-level chebyshev_steps
    chunks so no dispatch exceeds ``chunk`` operator applications."""
    from .krylov import chebyshev_init, chebyshev_steps
    lo0, hi0 = spectrum
    if not (np.isfinite(lo0) and np.isfinite(hi0) and lo0 > 0
            and hi0 > 0):
        return None
    hi_m = 1.05 * hi0
    if chunk is None:
        chunk = _auto_chunk(n_dof, n_iter)
    chunk = max(1, min(chunk, n_iter))
    n_calls = -(-n_iter // chunk)

    # the interval is a traced argument: ONE backend compile for all
    # lower-edge candidates (a fresh jit per candidate measured 13 s
    # each on this host)
    @jax.jit
    def start(op, lo_t, hi_t):
        b = jax.random.normal(jax.random.PRNGKey(seed), (n_dof,), dtype)
        return chebyshev_init(op, b, interval=(lo_t, hi_t)), \
            jnp.linalg.norm(b)

    @jax.jit
    def advance(op, carry, lo_t, hi_t):
        carry = chebyshev_steps(op, carry, chunk, (lo_t, hi_t))
        return carry, jnp.linalg.norm(carry[1])

    def measure(interval):
        lo_t = jnp.asarray(interval[0], dtype)
        hi_t = jnp.asarray(interval[1], dtype)
        carry, nb = start(op, lo_t, hi_t)
        for _ in range(n_calls):
            carry, nr = advance(op, carry, lo_t, hi_t)
            jax.block_until_ready(nr)       # bound in-flight work
        red = float(nr) / float(nb)
        if not np.isfinite(red) or red <= 0:
            return None
        return float(min(red, 1.0) ** (1.0 / (n_calls * chunk)))

    best = None
    for f in (1.0, 0.4, 0.15, 0.05):
        lo_m = 0.9 * lo0 * f
        if lo_m <= 1e-3 * hi_m:
            continue
        rate = measure((lo_m, hi_m))
        if rate is not None and (best is None or rate < best[1]):
            best = ((lo_m, hi_m), rate)
    if best is None or best[1] > 0.93:
        return None
    return best
