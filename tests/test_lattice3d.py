"""3D lattice fast paths (solver/lattice_reduce.py) on a brick mesh:
the affine fit must cover the volume K/residual streams and the node
gather, and the reduced tangent must match the generic gather fallback
bit-for-bit in effect.  (2D coverage lives in test_multigrid /
test_pallas_spmv; 3D has 117 offsets and 400-column streams.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov
from metafem.solver.domain import FEM_Domain


def _brick_thermal(nel=(8, 8, 8), itp_order=2, itp_type="Serendipity"):
    L = 1.0
    vert, conn = mf.make_brick((L, L, L), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    bot = mf.select_facets(geo, lambda c: c[:, 2] < eps)
    top = mf.select_facets(geo, lambda c: c[:, 2] > L - eps)
    bg_b = dom.add_boundary(wp, bot)
    bg_t = dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg_b,
                                 1000.0 * Bilinear(T, 800.0 - T))
    dom.assign_boundary_weakform(wp, bg_t, 50.0 * Bilinear(T, 300.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=itp_order, itg_order=3,
                       itp_type=itp_type)
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.set_field(wp, "s", np.full(mesh.n_cp, 100.0))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


def test_3d_fast_paths_fit_and_match():
    dom = _brick_thermal()
    mesh = dom.workpieces[0].mesh
    assert mesh.lattice_shape == (17, 17, 17)
    # n_cp = 4913 >= dense_min_n: the volume K stream must be dense and
    # fully affine (100% coverage, no COO tail on a lattice brick)
    assert dom.pattern.offset_layout.n_coo == 0
    fm = dom._fast_maps
    lin_k = fm["lin"]["k"]
    assert len(lin_k) == 1
    (fs_list, rest_cols), = lin_k.values()
    assert len(fs_list) == 400 and rest_cols.size == 0   # 20x20 columns
    assert fm["nl"]["r"] and 0 in fm["gather"]

    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["x_star"] = dom.x
    state["K_linear"] = dom._k_linear(state)
    residue, K = dom._res_k(state)
    # generic fallback (no device maps -> gather constants path)
    state2 = dict(state)
    state2.pop("maps")
    state2["K_linear"] = jax.jit(dom._k_linear.__wrapped__)(state2)
    residue2, K2 = jax.jit(dom._res_k.__wrapped__)(state2)
    np.testing.assert_allclose(np.asarray(state["K_linear"]),
                               np.asarray(state2["K_linear"]),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(residue), np.asarray(residue2),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K2),
                               rtol=1e-12, atol=1e-9)


def test_3d_scan_interleave_matches():
    """The scan-interleave reduction (bounded-liveness form for 3D scale,
    lattice_reduce.scan_apply_group) must reproduce the unrolled
    interleave bit-for-bit in effect on the same brick problem."""
    from metafem.solver import lattice_reduce as lr

    def k_r(dom):
        dom.time_discretization.update_time(dom.dt,
                                            dom.pattern.max_time_level)
        state = dom._runtime_state()
        state["x_star"] = dom.x
        state["K_linear"] = dom._k_linear(state)
        residue, K = dom._res_k(state)
        return (np.asarray(state["K_linear"]), np.asarray(residue),
                np.asarray(K))

    saved = lr.SCAN
    try:
        lr.SCAN = False
        k0, r0, kt0 = k_r(_brick_thermal(nel=(6, 6, 6)))
        lr.SCAN = True
        k1, r1, kt1 = k_r(_brick_thermal(nel=(6, 6, 6)))
    finally:
        lr.SCAN = saved
    np.testing.assert_allclose(k0, k1, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(r0, r1, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(kt0, kt1, rtol=1e-12, atol=1e-9)


def _mg_step_roundtrip(dom):
    dom.converge_tol = 1e-8
    step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=60,
                                max_newton=5, max_pass=2, precond="mg")
    state = dom._runtime_state()
    x_new, dx, res, it = step(state, dom.x, jnp.float64(0.0),
                              jnp.float64(1.0))
    assert float(res) < 1e-8
    # cross-check against the host-loop path
    res_host = dom.update_one_step(max_iter=5)
    assert res_host < 1e-6
    scale = np.abs(np.asarray(dom.x)).max()
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(dom.x),
                               atol=1e-6 * scale)


def test_3d_mg_step_converges_smoke():
    """Default-tier variant: order-1 Lagrange (27 offsets instead of the
    order-2 Serendipity 117) keeps the jitted-MG-step program an order
    of magnitude smaller to compile; the full-fidelity oracle runs in
    the slow tier below."""
    _mg_step_roundtrip(_brick_thermal(itp_order=1, itp_type="Lagrange"))


@pytest.mark.slow
def test_3d_mg_step_converges():
    _mg_step_roundtrip(_brick_thermal())
