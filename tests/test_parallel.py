"""Multi-device sharding on the virtual 8-device CPU mesh: element-axis
data-parallel assembly must reproduce single-device results exactly, and
the row-sharded solver layout (parallel/rowshard.py) must match the
replicated path while actually landing K and the Krylov vectors on
row-block shards (collectives visible in the compiled module)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov
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


@pytest.fixture(scope="module")
def strip_dom_100k():
    """~108k DOF: (280, 128) order-2 serendipity thermal strip with a
    nonlinear (radiation) boundary — the at-scale fixture for the
    row-sharded solver layouts.  lattice_pad=8 rounds the leading
    lattice axis to the 8-device mesh so vectors / storage / lattice
    arrays genuinely split (uneven sizes silently replicate)."""
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), (280, 128))
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
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity",
                       lattice_pad=8)
    dom.assemble_global_variables()
    dom.compile()
    mesh0 = dom.workpieces[wp].mesh
    assert dom.pattern.basicfield_size >= 100_000
    assert dom.pattern.basicfield_size % 8 == 0
    rng = np.random.default_rng(1)
    dom.set_field(wp, "T", 300 + 10 * rng.random(mesh0.n_cp))
    dom.set_field(wp, "s", rng.random(mesh0.n_cp))
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

    def test_rowshard_step_matches_and_shards(self, strip_dom_100k):
        """Row-sharded K + sharded-Krylov layout at >=100k DOF: the full
        jitted Newton step over the 8-device mesh must (a) reproduce the
        single-device solution and (b) compile to a genuinely partitioned
        module (cross-device collectives present), with the assembled K
        landing on storage shards rather than replicated."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        dom = strip_dom_100k
        dom.converge_tol = 1e-9

        mesh = make_mesh(min(8, len(jax.devices())))
        state = dom._runtime_state()
        sharded = shard_domain_state(state, mesh)

        step_sh = dom.make_jitted_step(
            sv_func=krylov.bicgstab, maxiter=4000, max_newton=4,
            max_pass=2, rowshard_mesh=mesh)
        x_rep = jax.device_put(dom.x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        args = (sharded, x_rep, jnp.float64(0.0), jnp.float64(1.0))

        # (b): the compiled module must be partitioned — cross-device
        # collectives present (reduce-scatter/all-reduce for the K
        # shards and the psum'd Krylov dots)
        txt = step_sh.lower(*args).compile().as_text()
        assert any(c in txt for c in
                   ("reduce-scatter", "all-reduce", "all-gather")), (
            "no collectives in the compiled step — layout replicated?")

        x_sh, _, res_sh, _ = step_sh(*args)
        assert float(res_sh) < 1e-9

        step0 = dom.make_jitted_step(
            sv_func=krylov.bicgstab, maxiter=4000, max_newton=4,
            max_pass=2)
        x0, _, res0, _ = step0(state, dom.x, jnp.float64(0.0),
                               jnp.float64(1.0))
        assert float(res0) < 1e-9
        scale = np.abs(np.asarray(x0)).max()
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x0),
                                   atol=1e-8 * scale)

    def test_rowshard_mg_step_matches_and_converges(self, strip_dom_100k):
        """The PRODUCTION multi-device path: MG-preconditioned row-sharded
        step at >=100k DOF.  Jacobi-preconditioned Krylov stalls at ~5e-2
        at 1M DOF (kappa ~ h^-2, PERFORMANCE.md), so the scale-out layout
        is only production-grade with the V-cycle inside it: the frozen
        fine level runs sharded over the mesh (shard_mg_state), coarse
        levels replicated.  Must (a) converge to 1e-6 and below, (b)
        match the single-device MG step, (c) compile to a partitioned
        module with cross-device collectives."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        dom = strip_dom_100k
        dom.converge_tol = 1e-9
        dom.freeze_linear_tangent()
        dom.setup_mg(tune=False)

        mesh = make_mesh(min(8, len(jax.devices())))
        state = dom._runtime_state()
        sharded = shard_domain_state(state, mesh)
        assert sharded["mg_frozen"] is not None
        # fine-level smoother state actually lands SPLIT (a replicated
        # array also reports all devices — check the shard shapes)
        fine = sharded["mg_frozen"][0]
        n_dev = mesh.devices.size
        assert not fine["inv_diag"].sharding.is_fully_replicated
        assert (fine["inv_diag"].addressable_shards[0].data.shape[1]
                == fine["inv_diag"].shape[1] // n_dev)
        assert not fine["A"].vals.sharding.is_fully_replicated
        assert (fine["A"].vals.addressable_shards[0].data.shape[0]
                == fine["A"].vals.shape[0] // n_dev)

        kw = dict(sv_func=krylov.bicgstab, maxiter=100, max_newton=4,
                  max_pass=2, precond="mg", reuse_mg=True,
                  static_k_linear=True)
        step_sh = dom.make_jitted_step(rowshard_mesh=mesh, **kw)
        x_rep = jax.device_put(dom.x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        args = (sharded, x_rep, jnp.float64(0.0), jnp.float64(1.0))
        txt = step_sh.lower(*args).compile().as_text()
        assert any(c in txt for c in
                   ("reduce-scatter", "all-reduce", "all-gather",
                    "collective-permute")), (
            "no collectives in the compiled MG step — layout replicated?")

        x_sh, _, res_sh, _ = step_sh(*args)
        assert float(res_sh) < 1e-9

        step0 = dom.make_jitted_step(**kw)
        x0, _, res0, _ = step0(state, dom.x, jnp.float64(0.0),
                               jnp.float64(1.0))
        assert float(res0) < 1e-9
        scale = np.abs(np.asarray(x0)).max()
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x0),
                                   atol=1e-8 * scale)

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
