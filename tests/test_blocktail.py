"""BSR block tail (linsolve/block_offset.py blk_b) + Morton locality
renumbering (mesh/fem_mesh._morton_renumber) — the unstructured-mesh
SpMV fast path: the tail of the block-offset storage becomes dense
b x b blocks so one gather index moves b contiguous x values.

Oracle: the SAME physics assembled with the scalar COO tail
(blk_min_tail=inf).  Everything — the assembled operator, mv/tmv,
Jacobi scaling, the two-float SpMV, and a converged Newton solve —
must agree to the storage dtype's accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve.block_offset import OffsetMatrix
from metafem.linsolve import twofloat as tf
from metafem.solver.domain import FEM_Domain


def _unstructured_geo(seed=0):
    """A jittered triangle mesh: lattice numbering must bail, so the
    Morton fallback + (forced) BSR tail engage."""
    vert, conn = mf.make_square((1.0, 1.0), (10, 10), shape="SIMPLEX")
    vert = np.array(vert)
    rng = np.random.default_rng(seed)
    inner = (vert[:, 0] > 1e-9) & (vert[:, 0] < 1 - 1e-9) \
        & (vert[:, 1] > 1e-9) & (vert[:, 1] < 1 - 1e-9)
    vert[inner] += rng.uniform(-0.02, 0.02, size=(inner.sum(), 2))
    return mf.construct_total_mesh(vert, conn)


def _build(geo, blk_min_tail):
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    bg = dom.add_boundary(wp, geo.boundary_facet_ids())
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -2.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg, 30.0 * Bilinear(T, 300.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5)
    dom.assemble_global_variables(blk_min_tail=blk_min_tail)
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.set_field(wp, "s", np.full(mesh.n_cp, 500.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 1e-10
    return dom, wp


def _tangent(dom):
    dom.time_discretization.update_time(1.0, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    return A, residue


@pytest.fixture(scope="module")
def pair():
    geo = _unstructured_geo()
    dom_b, wp_b = _build(geo, blk_min_tail=1)       # forced BSR tail
    dom_s, wp_s = _build(geo, blk_min_tail=10 ** 12)  # scalar oracle
    assert dom_b.pattern.offset_layout.blk_b == 8
    assert dom_s.pattern.offset_layout.blk_b == 0
    assert dom_b.pattern.offset_layout.n_coo > 0
    return dom_b, dom_s, wp_b


def test_morton_engaged(pair):
    dom_b, _, wp = pair
    mesh = dom_b.workpieces[wp].mesh
    assert mesh.lattice_shape is None
    # Morton order: consecutive ids are spatially near — the mean
    # distance between consecutive cps must be far below random order
    c = mesh.cp_coords
    step = np.linalg.norm(np.diff(c, axis=0), axis=1)
    assert np.median(step) < 0.1       # ~2 cp spacings on this mesh


def test_operator_matches_scalar_tail(pair):
    dom_b, dom_s, _ = pair
    A_b, r_b = _tangent(dom_b)
    A_s, r_s = _tangent(dom_s)
    np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_s),
                               rtol=0, atol=1e-9 * np.abs(r_s).max())
    D_b = A_b.to_scipy().toarray()
    D_s = A_s.to_scipy().toarray()
    np.testing.assert_allclose(D_b, D_s, rtol=0,
                               atol=1e-9 * np.abs(D_s).max())


def test_mv_tmv_scale_diag(pair):
    dom_b, dom_s, _ = pair
    A_b, _ = _tangent(dom_b)
    A_s, _ = _tangent(dom_s)
    n = A_b.n
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n), A_b.vals.dtype)
    tol = dict(rtol=1e-12, atol=1e-12 * float(jnp.abs(A_s.mv(x)).max()))
    np.testing.assert_allclose(np.asarray(A_b.mv(x)),
                               np.asarray(A_s.mv(x)), **tol)
    np.testing.assert_allclose(np.asarray(A_b.tmv(x)),
                               np.asarray(A_s.tmv(x)), **tol)
    np.testing.assert_allclose(np.asarray(A_b.diag()),
                               np.asarray(A_s.diag()), rtol=1e-14)
    s = jnp.asarray(rng.uniform(0.5, 2.0, n), A_b.vals.dtype)
    np.testing.assert_allclose(
        np.asarray(A_b.scale_cols(s).mv(x)),
        np.asarray(A_s.scale_cols(s).mv(x)), **tol)
    np.testing.assert_allclose(
        np.asarray(A_b.scale_rows(s).mv(x)),
        np.asarray(A_s.scale_rows(s).mv(x)), **tol)


def test_df_offset_mv_blocked(pair):
    """Two-float SpMV through the BSR tail keeps ~2^-48 accuracy."""
    dom_b, _, _ = pair
    A_b, _ = _tangent(dom_b)
    lo = dom_b.pattern.offset_layout
    n = lo.n
    rng = np.random.default_rng(2)
    x64 = rng.standard_normal(n)
    vals32 = jnp.asarray(A_b.vals, jnp.float32)
    v_df = tf.DF(vals32, jnp.zeros_like(vals32))
    x_df = tf.df_from_f64(x64.astype(np.float64))
    y = tf.df_offset_mv(v_df, lo, x_df)
    y64 = np.asarray(tf.df_to_f64(y))
    import scipy.sparse as sp
    A32 = OffsetMatrix.from_values(vals32, lo)
    ref = A32.to_scipy().astype(np.float64) @ x64
    scale = np.abs(ref).max()
    np.testing.assert_allclose(y64, ref, rtol=0, atol=1e-12 * scale)


def test_converged_solve_matches(pair):
    dom_b, dom_s, wp = pair
    res_b = dom_b.update_one_step(max_iter=5)
    res_s = dom_s.update_one_step(max_iter=5)
    assert res_b < 1e-10 and res_s < 1e-10
    dom_b.dessemble_x()
    dom_s.dessemble_x()
    T_b = dom_b.workpieces[wp].mesh.fields["T"]
    T_s = dom_s.workpieces[wp].mesh.fields["T"]
    np.testing.assert_allclose(T_b, T_s, rtol=0, atol=1e-6)
