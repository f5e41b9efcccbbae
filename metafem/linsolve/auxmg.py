"""Auxiliary-space multigrid preconditioner for UNSTRUCTURED meshes.

The geometric multigrid in multigrid.py needs lattice control-point
numbering — graded tet meshes (the reference's flagship pikachu mesh,
docs/src/examples/src/pikachu/pikachu.jl) never qualify: embedding the
nodes injectively in a uniform lattice inflates 100x+ under 5x grading
(measured).  The TPU-native answer is *auxiliary-space preconditioning*
(Xu 1996): keep the true unstructured operator A for fine-level
smoothing, and route the coarse-grid correction through a uniform
auxiliary lattice that does NOT have to resolve the fine mesh —

    M = smoother(A)  +  P · MG_lattice(Pᵀ A P) · Pᵀ

* P is nodewise multilinear interpolation from the 2^d corners of each
  node's auxiliary cell — on device it is 2^d gathers (P) / segment-sums
  + static lattice shifts (Pᵀ), no scatters.
* The Galerkin aux operator Pᵀ A P is assembled ONCE on the host (scipy,
  at setup) and lands exactly in the lattice-stencil form the existing
  hierarchy consumes (multigrid.mg_setup_from_stencil): probed Galerkin
  coarsening, damped-Jacobi smoothing, dense MXU coarsest solve — all
  reused unchanged below the aux level.
* Aux cells never touched by a node are ghost slots: unit-sign diagonal,
  masked transfers (the same ghost treatment as the lattice path).

This replaces the role of the reference's ILU preconditioner
(src/solvers/02_Preconditioner.jl) for its unstructured examples — ILU's
sequential triangular solves are TPU-hostile (see poly.py); a V-cycle is
a handful of SpMVs + dense lattice stencils.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import multigrid
from .block_offset import OffsetMatrix
from .multigrid import MGHierarchy, _safe_inv


@dataclasses.dataclass(frozen=True)
class AuxDesc:
    """Static description (jit aux data) of the aux-space transfer."""
    dim: int
    channels: int
    n_cp: int
    n_lat: int
    aux_shape: Tuple[int, ...]
    corner_offs: Tuple[int, ...]        # 2^d flat lattice offsets (>= 0)
    nu1: int = 2
    nu2: int = 2
    #: "full": smoothing residuals on the true operator (every V-cycle
    #: pays nu1+nu2+1 gather-bound tail SpMVs).  "sparse": smoothing and
    #: the coarse-grid residual run on a SPARSIFIED operator — dense
    #: offset segments + the BSR tail's block diagonal, with the dropped
    #: tail couplings lumped onto the diagonal (row sums, and with them
    #: the action on the smooth modes the aux correction targets, are
    #: preserved exactly).  Only the outer A∘M product then touches the
    #: tail: one gather-bound SpMV per preconditioned operator apply
    #: instead of nu1+nu2+2.  The sparsified pieces are refreshed per
    #: tangent by refresh_tangent().
    smooth: str = "full"


def estimate_spacing(coords: np.ndarray, el_cp: np.ndarray,
                     sample: int = 20000, seed: int = 0,
                     diam_q: float = 0.99) -> Tuple[float, float]:
    """(median min intra-element cp distance, ``diam_q``-quantile of the
    element diameter) over (sampled) elements — the natural fine
    resolution of the mesh and the span of its largest elements."""
    n_el = len(el_cp)
    if n_el > sample:
        idx = np.random.default_rng(seed).choice(n_el, sample,
                                                 replace=False)
        el_cp = el_cp[idx]
    p = coords[el_cp]                                   # [e, a, dim]
    d = np.linalg.norm(p[:, :, None, :] - p[:, None, :, :], axis=-1)
    iu = np.triu_indices(el_cp.shape[1], 1)
    pair_d = d[:, iu[0], iu[1]]
    return (float(np.median(pair_d.min(axis=1))),
            float(np.quantile(pair_d.max(axis=1), diam_q)))


def build_transfer(coords: np.ndarray, h: float, wclamp: float = 0.1):
    """Cell ids + multilinear corner weights of each node on a uniform
    lattice of spacing ``h`` covering the point cloud (1-cell margin so
    corner ids never leave the lattice).

    Returns (cell_flat [n], weights [n, 2^d], aux_shape, corner_offs)."""
    n, dim = coords.shape
    lo = coords.min(axis=0) - 1.5 * h
    rel = (coords - lo) / h
    cell = np.floor(rel).astype(np.int64)
    frac = rel - cell
    shape = tuple(int(s) for s in (cell.max(axis=0) + 2))
    strides = np.cumprod((1,) + shape[:0:-1])[::-1].astype(np.int64)
    cell_flat = cell @ strides
    corners = list(itertools.product((0, 1), repeat=dim))
    corner_offs = tuple(int(np.dot(c, strides)) for c in corners)
    w = np.ones((n, len(corners)))
    for j, c in enumerate(corners):
        for a, bit in enumerate(c):
            w[:, j] *= frac[:, a] if bit else (1.0 - frac[:, a])
    # Clamp small corner weights and renormalize: keeps the partition of
    # unity while preventing aux points touched only through weak tails.
    # Those rows are near-null in the Galerkin operator and their
    # effective inverse blows up the aux correction — measured on
    # pikachu refine=2 (1.36M DOF): wclamp 1e-3 leaves a preconditioned
    # lam_max of 13-166 (h-dependent); 0.1 gives [0.09, 1.0] and a
    # Chebyshev-able operator (benchmarks/auxmg_probe.py).
    w[w < wclamp] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    return cell_flat, w, shape, corner_offs


def galerkin_stencil(A_scipy, cell_flat: np.ndarray, w: np.ndarray,
                     aux_shape: Tuple[int, ...], channels: int,
                     radius: int, dtype, lump: bool = True):
    """Host Galerkin Pᵀ A P on the aux lattice, returned in the stencil
    form [n_off, C, C, *aux_shape] the lattice hierarchy consumes, plus
    the occupancy mask and the dropped-entry fraction.

    Entries whose per-axis lattice displacement exceeds ``radius`` (only
    couplings through elements much larger than the aux spacing) cannot
    be stored without squaring the stencil.  With ``lump`` (default)
    they are folded onto the row diagonal — preserving row sums, so the
    aux operator keeps the true action on the constant/low-frequency
    modes the coarse correction exists for.  Plain dropping makes the
    preconditioned operator INDEFINITE once the dropped fraction is
    non-negligible — measured on pikachu refine=2 (1.36M DOF, 1.1%
    dropped |A|): spectrum [-226, 226] dropped vs positive lumped, and
    the refined Newton step stalls at 6e-5 instead of converging
    (benchmarks/auxmg_probe.py)."""
    import scipy.sparse as sp

    n_lat = int(np.prod(aux_shape))
    dim = len(aux_shape)
    n_cp = len(cell_flat)
    rows = np.repeat(np.arange(n_cp, dtype=np.int64), w.shape[1])
    # corner flat ids
    strides = np.cumprod((1,) + aux_shape[:0:-1])[::-1].astype(np.int64)
    corners = list(itertools.product((0, 1), repeat=dim))
    corner_offs = np.asarray([np.dot(c, strides) for c in corners])
    cols = (cell_flat[:, None] + corner_offs[None, :]).reshape(-1)
    P1 = sp.coo_matrix((w.reshape(-1), (rows, cols)),
                       shape=(n_cp, n_lat)).tocsr()
    P = sp.kron(sp.eye(channels, format="csr"), P1, format="csr")
    Ac = (P.T @ A_scipy.tocsr() @ P).tocoo()

    ci, cj = Ac.row // n_lat, Ac.col // n_lat
    li, lj = Ac.row % n_lat, Ac.col % n_lat
    # Per-axis lattice displacements by integer arithmetic on the flat
    # ids (vectorized; materializing [nnz, dim] coordinate stacks and a
    # per-entry Python offset lookup measured ~80 s at 30M entries).
    n_off = (2 * radius + 1) ** dim
    oi = np.zeros(li.shape, np.int64)        # flat offset index
    keep = np.ones(li.shape, bool)
    ldiv_i, ldiv_j = li, lj
    k_rev = []
    for s in reversed(aux_shape):
        k_rev.append(ldiv_j % s - ldiv_i % s)
        ldiv_i, ldiv_j = ldiv_i // s, ldiv_j // s
    for ka in reversed(k_rev):               # axis 0 first (slowest)
        keep &= np.abs(ka) <= radius
        oi = oi * (2 * radius + 1) + np.clip(ka + radius, 0,
                                             2 * radius)
    dropped = 1.0 - (np.abs(Ac.data[keep]).sum()
                     / max(np.abs(Ac.data).sum(), 1e-300))

    offsets = list(itertools.product(range(-radius, radius + 1),
                                     repeat=dim))
    assert len(offsets) == n_off
    # scatter-add via bincount on the composite flat index (np.add.at
    # measured ~10x slower at this size)
    lin = (((oi[keep] * channels + ci[keep]) * channels + cj[keep])
           * n_lat + li[keep])
    weights = Ac.data[keep]
    if lump and not keep.all():
        # fold out-of-radius couplings onto the row diagonal (same
        # channel, zero offset): row sums — and with them the operator's
        # action on the low-frequency modes — are preserved exactly
        nd = ~keep
        i0d = (n_off - 1) // 2
        lin_d = (((np.full(int(nd.sum()), i0d, np.int64) * channels
                   + ci[nd]) * channels + ci[nd]) * n_lat + li[nd])
        lin = np.concatenate([lin, lin_d])
        weights = np.concatenate([weights, Ac.data[nd]])
    coefs = np.bincount(
        lin, weights=weights,
        minlength=n_off * channels * channels * n_lat).reshape(
            n_off, channels, channels, n_lat)

    # occupancy: aux points receiving any interpolation weight
    occupied = np.zeros(n_lat, dtype=bool)
    occupied[np.unique(cols[w.reshape(-1) != 0.0])] = True
    # ghost slots: typical-magnitude diagonal of the PDE's sign so the
    # smoother calibration and Jacobi stay sane; masked transfers keep
    # them out of the correction entirely
    i0 = (n_off - 1) // 2          # the all-zero (diagonal) offset
    diag_occ = coefs[i0, np.arange(channels)[:, None],
                     np.arange(channels)[:, None], occupied]
    dmed = np.median(np.abs(diag_occ)) or 1.0
    dsign = np.sign(np.median(diag_occ)) or 1.0
    for c in range(channels):
        coefs[i0, c, c, ~occupied] = dsign * dmed
    coefs = coefs.reshape((len(offsets), channels, channels) + aux_shape)
    mask = occupied.astype(np.float64)
    return (jnp.asarray(coefs, dtype), jnp.asarray(mask, dtype),
            float(dropped))


def setup(domain, K_total, h: float = None, h_factor: float = 2.0,
          radius: int = 2, nu1: int = 2, nu2: int = 2, n_power: int = 12,
          smooth: str = "full", verbose: bool = False, **hier_opts):
    """Freeze the aux-space MG state from an assembled tangent's storage
    values ``K_total`` (see FEM_Domain.setup_auxmg).  Returns the
    (pytree, static) pair make_op consumes."""
    import scipy.sparse as sp

    if len(domain.workpieces) != 1:
        raise ValueError("auxmg: single-workpiece domains only")
    wp = domain.workpieces[0]
    mesh = wp.mesh
    if mesh.lattice_shape is not None:
        raise ValueError("auxmg targets unstructured meshes; this mesh "
                         "has lattice numbering — use precond='mg'")
    pattern = domain.pattern
    layout = pattern.offset_layout
    C = pattern.wp_infos[0].n_vars
    n_cp = mesh.n_cp
    coords = mesh.cp_coords
    occ = mesh.is_occupied
    if occ is not None and not occ.all():
        # scale-out ghost cps (NaN coords, unit-diagonal rows): park
        # them in a valid cell with ZERO interpolation weight — the
        # transfers then ignore them and the fine smoother sees only
        # their unit diagonal
        coords = np.where(occ[:, None], coords,
                          np.nanmin(coords, axis=0))

    if h is None:
        # two geometric bounds (measured on pikachu refine=2, 1.36M DOF,
        # 5x graded — benchmarks/auxmg_probe.py):
        # * resolution: h ~ h_factor x the median fine spacing;
        # * coupling span: the largest elements must fit the stencil,
        #   h >= diam_q99 / radius — under grading the fine-spacing rule
        #   alone leaves >1% of |A| out of radius and the preconditioned
        #   spectrum blows up (lam_max 694 at h_factor=2) where the
        #   diameter rule keeps it clean ([0.09, 1.0], Chebyshev-able).
        spacing, diam_hi = estimate_spacing(coords, mesh.el_cp)
        h = max(h_factor * spacing, diam_hi / radius)
    cell_flat, w, aux_shape, corner_offs = build_transfer(coords, h)
    if occ is not None and not occ.all():
        w = np.where(occ[:, None], w, 0.0)

    vals = np.asarray(K_total, np.float64)[layout.storage_of_slot]
    A_sp = sp.coo_matrix(
        (vals, (pattern.coo_rows.astype(np.int64),
                pattern.coo_cols.astype(np.int64))),
        shape=(pattern.basicfield_size, pattern.basicfield_size))
    # Build + probe the aux hierarchy on the HOST CPU backend in f64:
    # this is one-time setup (like freeze_refined_residual), f64 probing
    # is exact, and the setup program (dense coarsest inverse included)
    # need not go through the TPU compiler at all.  Only the finished
    # V-cycle state ships to the default device, in the domain dtype.
    hier = multigrid.build_hierarchy(
        aux_shape, C, fine_radius=2 * radius - 2, nu1=nu1, nu2=nu2,
        n_power=n_power, **hier_opts)
    assert hier.radius == radius
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        coefs, mask, dropped = galerkin_stencil(
            A_sp, cell_flat, w, aux_shape, C, radius, jnp.float64)
        lat_state = jax.jit(multigrid.mg_setup_from_stencil,
                            static_argnums=0)(hier, coefs, mask)
        lat_state = jax.block_until_ready(lat_state)
    if verbose:
        print(f"[auxmg] aux lattice {aux_shape} = "
              f"{int(np.prod(aux_shape))} points "
              f"({np.prod(aux_shape)/n_cp:.2f}x of {n_cp} cps), "
              f"dropped |A_c| fraction {dropped:.2e}")
    lat_state = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(domain.dtype), lat_state))

    # fine-level damped-Jacobi calibration (in the domain dtype on the
    # compute device; K_total may arrive as host f64).  The calibration
    # runs on the SMOOTHING operator — the sparsified As when
    # smooth='sparse' — since omega damps that operator's spectrum.
    A_dev = OffsetMatrix.from_values(
        jnp.asarray(np.asarray(K_total), domain.dtype), layout)
    desc = AuxDesc(dim=mesh.dim, channels=C, n_cp=n_cp,
                   n_lat=int(np.prod(aux_shape)), aux_shape=aux_shape,
                   corner_offs=corner_offs, nu1=nu1, nu2=nu2,
                   smooth=smooth)
    tree = {"cell": jnp.asarray(cell_flat.astype(np.int32)),
            "w": jnp.asarray(w, domain.dtype), "lat": lat_state}
    if smooth == "sparse" and layout.blk_b:
        # static BSR-tail block-diagonal extraction indices
        bd_sel = np.flatnonzero(layout.coo_rows == layout.coo_cols)
        tree["bd_sel"] = jnp.asarray(bd_sel.astype(np.int32))
        tree["bd_rows"] = jnp.asarray(layout.coo_rows[bd_sel])
    tree = jax.jit(refresh_tangent,
                   static_argnums=2)(A_dev, tree, desc)
    invd = tree["inv_diag"]
    smoother_of = (AuxMGOperator(A_dev, {**tree, "omega": 1.0},
                                 hier, desc)._smoother())

    # host-chunked power iteration (multigrid._auto_chunk): at 1M+ DOF
    # an n_power-long scan of full-size SpMVs in ONE dispatch risks the
    # remote-transport wedge the spectrum/tuner scans also avoid
    cal_chunk = max(1, min(multigrid._auto_chunk(
        pattern.basicfield_size, n_power), n_power))

    @jax.jit
    def cal_steps(S, invd, v):
        def body(v, _):
            u = invd * S.mv(v)
            lam = jnp.linalg.norm(u)
            return u / jnp.where(lam == 0, 1.0, lam), lam

        v, lams = jax.lax.scan(body, v, None, length=cal_chunk)
        return v, lams[-1]

    v = jax.random.normal(jax.random.PRNGKey(7),
                          (pattern.basicfield_size,), invd.dtype)
    v = v / jnp.linalg.norm(v)
    for _ in range(-(-n_power // cal_chunk)):
        v, lam = cal_steps(smoother_of, invd, v)
        jax.block_until_ready(lam)
    lam = lam * 1.1
    omega = (4.0 / 3.0) / jnp.where(lam == 0, 1.0, lam)
    tree["omega"] = omega
    # preconditioned-spectrum estimate + tuned Chebyshev enclosure
    op = AuxMGOperator(A_dev, tree, hier, desc)
    nb = pattern.basicfield_size
    domain._auxmg_spectrum = multigrid.estimate_spectrum(
        op, nb, domain.dtype)
    domain._auxmg_cheb = multigrid.tune_chebyshev(
        op, nb, domain.dtype, domain._auxmg_spectrum)
    if verbose:
        lo, hi = domain._auxmg_spectrum
        print(f"[auxmg] precond spectrum ~ [{lo:.3f}, {hi:.3f}], "
              f"cheb {domain._auxmg_cheb}", flush=True)
    return tree, (desc, hier)


def _shift_flat(s: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    """y[i + k] = s[i] on the flat lattice axis (k >= 0 here)."""
    if k == 0:
        return s
    return jnp.concatenate([jnp.zeros(s.shape[:-1] + (k,), s.dtype),
                            s[..., :n - k]], axis=-1)


# ---------------------------------------------------------------------------
# sparsified smoothing operator (desc.smooth == "sparse")
# ---------------------------------------------------------------------------

def _dense_only_layout(layout):
    """A tailless view of an OffsetLayout: same dense segments, empty
    COO/BSR tail — OffsetMatrix.mv over it touches only the dense
    shifted-stream storage (no gathers).  Cached on the layout object
    (layouts are id-hashed static jit aux data)."""
    cached = getattr(layout, "_dense_only_view", None)
    if cached is None:
        cached = dataclasses.replace(
            layout, n_storage=layout.n_dense,
            coo_rows=np.zeros(0, np.int32),
            coo_cols=np.zeros(0, np.int32), blk_b=0)
        layout._dense_only_view = cached
    return cached


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseSmoothOp:
    """Sparsified stand-in for the fine operator inside the V-cycle:

        As = dense offset segments + BSR-tail block diagonal
             + diag(lumped dropped-tail row sums)

    Every piece streams (dense segments) or contracts pad-free dense
    lanes (block diagonal [b, b, nbr]) — ZERO gather/scatter index ops,
    vs the 2*nb random-index floor of the full tail SpMV.  Row sums
    match the true operator exactly (lumping), so the action on the
    smooth modes the aux-lattice correction targets is preserved; only
    the high-frequency inter-block couplings are approximated, which the
    damped-Jacobi smoother tolerates (measured: see PERFORMANCE.md
    round-5 pikachu table)."""
    dense: OffsetMatrix               # tailless view, shares vals buffer
    bd_vals: jnp.ndarray              # [b, b, nbr] block-diag (or None)
    lump: jnp.ndarray                 # [n] dropped-tail row sums

    def tree_flatten(self):
        return (self.dense, self.bd_vals, self.lump), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.dense.mv(x) + self.lump * x
        if self.bd_vals is not None:
            lo = self.dense.layout
            b = self.bd_vals.shape[0]
            nbr = self.bd_vals.shape[2]
            xpT = jnp.pad(x, (0, nbr * b - lo.n)).reshape(nbr, b).T
            yT = jnp.einsum("ijr,jr->ir", self.bd_vals, xpT)  # [b, nbr]
            y = y + yT.T.reshape(-1)[:lo.n]
        return y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseInnerOp:
    """Ã ∘ M for a fully tail-free inner solve: the Krylov iteration
    runs on the SPARSIFIED tangent (SparseSmoothOp) so no inner
    iteration ever touches the gather-bound tail; the outer refined
    Newton measures TRUE residuals, so the sparsification error only
    sets the per-refine contraction (inexact Newton with a modified
    operator), never the answer."""
    op: "AuxMGOperator"

    def tree_flatten(self):
        return (self.op,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def mv(self, v: jnp.ndarray) -> jnp.ndarray:
        return self.op._smoother().mv(self.op.apply_m(v))

    def apply_m(self, y: jnp.ndarray) -> jnp.ndarray:
        return self.op.apply_m(y)


def refresh_tangent(A: OffsetMatrix, tree: dict, desc: AuxDesc) -> dict:
    """Per-tangent refresh of the V-cycle's fine-level state: the Jacobi
    inverse diagonal, and (smooth='sparse') the sparsified smoothing
    pieces — block-diagonal extraction (one [b*b, nbr]-sized
    gather/scatter) and the lumped row sums (one tail SpMV on ones).
    Both are one-time per tangent; the Krylov loop's nu1+nu2+1 smoothing
    SpMVs then run gather-free."""
    tree = {**tree, "inv_diag": _safe_inv(A.diag())}
    if desc.smooth != "sparse":
        return tree
    lo = A.layout
    dense = OffsetMatrix(A.vals, jnp.zeros(0, jnp.int32),
                         jnp.zeros(0, jnp.int32), _dense_only_layout(lo))
    bd_vals = None
    if lo.blk_b:
        b, nbr, nb = lo.blk_b, lo.n_block_rows, lo.n_coo
        bd_sel = tree["bd_sel"]           # static tail positions bi==bj
        bd_rows = tree["bd_rows"]
        B3 = A.vals[lo.n_dense:].reshape(b, b, nb)
        bd_vals = jnp.zeros((b, b, nbr), A.vals.dtype)
        bd_vals = bd_vals.at[:, :, bd_rows].set(B3[:, :, bd_sel])
    ones = jnp.ones(lo.n, A.vals.dtype)
    As0 = SparseSmoothOp(dense, bd_vals, jnp.zeros(lo.n, A.vals.dtype))
    tree["smooth_lump"] = A.mv(ones) - As0.mv(ones)
    tree["smooth_bd"] = bd_vals
    return tree


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AuxMGOperator:
    """A ∘ M for the Krylov menu: solve (A M) y = b, then x = M y."""
    A: OffsetMatrix
    tree: dict
    hier: MGHierarchy                     # static
    desc: AuxDesc                         # static

    def tree_flatten(self):
        return (self.A, self.tree), (self.hier, self.desc)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    # -- transfers ------------------------------------------------------
    # The random-index floor is paid PER INDEX, so both transfers are
    # restructured to ONE index stream of n_cp (instead of 2^d of them):
    # Pᵀ scatters [n_cp, 2^d] ROWS (all corner contributions of a cp
    # move under one segment id, the corner offsets then applied as
    # static flat shifts); P gathers rows of a shift-stacked
    # [n_lat, 2^d] table (xpad[c, j] = xf[c + off_j], built by 2^d
    # static shifts at stream rate).  Measured 8x fewer index ops in 3D.
    def _pt(self, r: jnp.ndarray) -> jnp.ndarray:
        """Pᵀ r: [C*n_cp] -> [C, *aux_shape]."""
        d, t = self.desc, self.tree
        rw = r.reshape(d.channels, d.n_cp)
        rc = jnp.zeros((d.channels, d.n_lat), r.dtype)
        for c in range(d.channels):
            data = t["w"] * rw[c][:, None]            # [n_cp, 2^d]
            s8 = jax.ops.segment_sum(data, t["cell"],
                                     num_segments=d.n_lat)  # [n_lat, 2^d]
            acc = jnp.zeros(d.n_lat, r.dtype)
            for j, off in enumerate(d.corner_offs):
                acc = acc + _shift_flat(s8[:, j], off, d.n_lat)
            rc = rc.at[c].set(acc)
        return rc.reshape((d.channels,) + d.aux_shape)

    def _p(self, xc: jnp.ndarray) -> jnp.ndarray:
        """P xc: [C, *aux_shape] -> [C*n_cp]."""
        d, t = self.desc, self.tree
        xf = xc.reshape(d.channels, d.n_lat)
        out = []
        for c in range(d.channels):
            xpad = jnp.stack(
                [xf[c] if off == 0
                 else jnp.concatenate([xf[c, off:],
                                       jnp.zeros(off, xc.dtype)])
                 for off in d.corner_offs], axis=1)    # [n_lat, 2^d]
            xf8 = xpad[t["cell"]]                      # one row gather
            out.append((t["w"] * xf8).sum(axis=1))
        return jnp.concatenate(out)

    # -- the aux V-cycle -------------------------------------------------
    def _smoother(self):
        """The operator smoothing residuals run against: the true A
        (smooth='full') or the gather-free sparsified As (see
        SparseSmoothOp) — the outer A∘M product always uses true A."""
        t = self.tree
        if self.desc.smooth == "sparse" and t.get("smooth_lump") is not None:
            lo = self.A.layout
            dense = OffsetMatrix(self.A.vals, jnp.zeros(0, jnp.int32),
                                 jnp.zeros(0, jnp.int32),
                                 _dense_only_layout(lo))
            return SparseSmoothOp(dense, t.get("smooth_bd"),
                                  t["smooth_lump"])
        return self.A

    def apply_m(self, b: jnp.ndarray) -> jnp.ndarray:
        d, t = self.desc, self.tree
        S = self._smoother()
        invd, om = t["inv_diag"], t["omega"]
        x = om * invd * b
        for _ in range(d.nu1 - 1):
            x = x + om * invd * (b - S.mv(x))
        r = b - S.mv(x)
        xc = multigrid._vcycle_level(self.hier, t["lat"], 0, self._pt(r))
        x = x + self._p(xc)
        for _ in range(d.nu2):
            x = x + om * invd * (b - S.mv(x))
        return x

    def mv(self, v: jnp.ndarray) -> jnp.ndarray:
        return self.A.mv(self.apply_m(v))
