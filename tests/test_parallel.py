"""Multi-device sharding on the virtual 8-device CPU mesh: element-axis
data-parallel assembly must reproduce single-device results exactly."""

import numpy as np
import jax
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.parallel import shard_domain_state
from metafem.parallel.dataparallel import make_mesh
from metafem.solver.domain import FEM_Domain


@pytest.fixture(scope="module")
def thermal_dom():
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), (10, 6))
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    bg = dom.add_boundary(wp, ends)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    n = dom.sym("n")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bg, 1000.0 * Bilinear(T, 1173.15 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i))
        + 0.7 * 5.669e-8 * Bilinear(T, 323.15 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    rng = np.random.default_rng(0)
    dom.set_field(wp, "T", 300 + 10 * rng.random(mesh.n_cp))
    dom.set_field(wp, "s", rng.random(mesh.n_cp))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


class TestElementSharding:
    def test_assembly_matches_single_device(self, thermal_dom):
        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        dom = thermal_dom
        state = dom._runtime_state()
        state["x_star"] = dom.x
        r0, K0 = dom._res_k(state)
        KL0 = dom._k_linear(state)

        mesh = make_mesh(min(8, len(jax.devices())))
        sharded = shard_domain_state(state, mesh)
        fn = jax.jit(dom._res_k.__wrapped__)
        r1, K1 = fn(sharded)
        KL1 = jax.jit(dom._k_linear.__wrapped__)(sharded)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(K1), np.asarray(K0),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(KL1), np.asarray(KL0),
                                   rtol=1e-12, atol=1e-12)

    def test_sharding_layout(self, thermal_dom):
        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        dom = thermal_dom
        state = dom._runtime_state()
        mesh = make_mesh(min(8, len(jax.devices())))
        sharded = shard_domain_state(state, mesh)
        el = sharded["wp"][0]["el"]["itg_vals"]
        assert el.shape[0] % mesh.devices.size == 0
        # each device holds exactly one element block
        assert len(el.sharding.device_set) == mesh.devices.size
