"""Multi-device sharding on the virtual 8-device CPU mesh: element-axis
data-parallel assembly must reproduce single-device results exactly, and
the row-sharded solver layout (parallel/rowshard.py) must match the
replicated path while actually landing K and the Krylov vectors on
row-block shards (collectives visible in the compiled module).

Two tiers: the default run exercises every layout on a ~10k-DOF strip
(smoke); the ``slow`` tier repeats the production checks at >=100k DOF
(run with --run-slow / METAFEM_TEST_SLOW=1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov, twofloat as tf
from metafem.parallel import shard_domain_state
from metafem.parallel.dataparallel import make_mesh
from metafem.solver.domain import FEM_Domain


def _make_strip(nel, lattice_pad=None, dtype=None, seed=1):
    """Order-2 serendipity thermal strip with a nonlinear (radiation)
    boundary — the fixture for the sharded solver layouts.  lattice_pad
    rounds the leading lattice axis to the device mesh so vectors /
    storage / lattice arrays genuinely split (uneven sizes silently
    replicate)."""
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2) if dtype is None else FEM_Domain(2, dtype=dtype)
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
    kw = {} if lattice_pad is None else {"lattice_pad": lattice_pad}
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity",
                       **kw)
    dom.assemble_global_variables()
    dom.compile()
    mesh0 = dom.workpieces[wp].mesh
    rng = np.random.default_rng(seed)
    dom.set_field(wp, "T", 300 + 10 * rng.random(mesh0.n_cp))
    dom.set_field(wp, "s", rng.random(mesh0.n_cp))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


@pytest.fixture(scope="module")
def thermal_dom():
    return _make_strip((10, 6))


@pytest.fixture(scope="module")
def strip_dom_small():
    """~10k DOF: the default-tier fixture for the row-sharded layouts."""
    dom = _make_strip((72, 32), lattice_pad=8)
    assert dom.pattern.basicfield_size % 8 == 0
    return dom


@pytest.fixture(scope="module")
def strip_dom_100k():
    """~108k DOF: the at-scale (slow-tier) fixture."""
    dom = _make_strip((280, 128), lattice_pad=8)
    assert dom.pattern.basicfield_size >= 100_000
    assert dom.pattern.basicfield_size % 8 == 0
    return dom


def _need_mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh(min(8, len(jax.devices())))


def _assert_collectives(txt, what):
    assert any(c in txt for c in
               ("reduce-scatter", "all-reduce", "all-gather",
                "collective-permute")), (
        f"no collectives in the compiled {what} — layout replicated?")


def _check_rowshard_step(dom, maxiter):
    """Row-sharded K + sharded-Krylov layout: the full jitted Newton step
    over the 8-device mesh must (a) reproduce the single-device solution
    and (b) compile to a genuinely partitioned module (cross-device
    collectives present), with the assembled K landing on storage shards
    rather than replicated."""
    mesh = _need_mesh()
    dom.converge_tol = 1e-9
    state = dom._runtime_state()
    sharded = shard_domain_state(state, mesh)

    step_sh = dom.make_jitted_step(
        sv_func=krylov.bicgstab, maxiter=maxiter, max_newton=4,
        max_pass=2, rowshard_mesh=mesh)
    x_rep = jax.device_put(dom.x, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    args = (sharded, x_rep, jnp.float64(0.0), jnp.float64(1.0))
    _assert_collectives(step_sh.lower(*args).compile().as_text(), "step")

    x_sh, _, res_sh, _ = step_sh(*args)
    assert float(res_sh) < 1e-9

    step0 = dom.make_jitted_step(
        sv_func=krylov.bicgstab, maxiter=maxiter, max_newton=4,
        max_pass=2)
    x0, _, res0, _ = step0(state, dom.x, jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res0) < 1e-9
    scale = np.abs(np.asarray(x0)).max()
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x0),
                               atol=1e-8 * scale)


def _check_rowshard_mg(dom):
    """The PRODUCTION multi-device path: MG-preconditioned row-sharded
    step.  Jacobi-preconditioned Krylov stalls at ~5e-2 at 1M DOF
    (kappa ~ h^-2, PERFORMANCE.md), so the scale-out layout is only
    production-grade with the V-cycle inside it: the frozen fine level
    runs sharded over the mesh (shard_mg_state), coarse levels
    replicated.  Must (a) converge to 1e-9, (b) match the single-device
    MG step, (c) compile to a partitioned module with collectives."""
    mesh = _need_mesh()
    dom.converge_tol = 1e-9
    dom.freeze_linear_tangent()
    dom.setup_mg(tune=False)

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
    _assert_collectives(step_sh.lower(*args).compile().as_text(),
                        "MG step")

    x_sh, _, res_sh, _ = step_sh(*args)
    assert float(res_sh) < 1e-9

    step0 = dom.make_jitted_step(**kw)
    x0, _, res0, _ = step0(state, dom.x, jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res0) < 1e-9
    scale = np.abs(np.asarray(x0)).max()
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x0),
                               atol=1e-8 * scale)


def _check_refined_rowshard(dom):
    """The production-tolerance path, sharded: make_refined_step with
    rowshard_mesh must converge to 1e-9 (exact frozen-operator
    residuals), match the single-device refined step, and compile to a
    partitioned module.  The frozen A_td / b land row-blocked
    (shard_domain_state), the fine MG level runs sharded."""
    mesh = _need_mesh()
    dom.converge_tol = 1e-9
    dom.freeze_linear_tangent()
    dom.setup_mg(tune=False)
    dom.freeze_refined_residual()

    state = dom._runtime_state()
    sharded = shard_domain_state(state, mesh)
    n_dev = mesh.devices.size
    ref = sharded["refined"]
    assert not ref["A_hi"].sharding.is_fully_replicated
    assert (ref["A_hi"].addressable_shards[0].data.shape[1]
            == ref["A_hi"].shape[1] // n_dev)
    assert not ref["b_hi"].sharding.is_fully_replicated

    kw = dict(sv_func=krylov.bicgstab, maxiter=100, max_refine=10,
              max_pass=1, precond="mg")
    step_sh = dom.make_refined_step(rowshard_mesh=mesh, **kw)
    x_rep = jax.device_put(jnp.asarray(dom.x), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    args = (sharded, x_rep, jnp.float64(0.0), jnp.float64(1.0))
    _assert_collectives(step_sh.lower(*args).compile().as_text(),
                        "refined step")

    x_sh, _, res_sh, _ = step_sh(*args)
    assert float(res_sh) < 1e-9

    step0 = dom.make_refined_step(**kw)
    x0, _, res0, _ = step0(state, jnp.asarray(dom.x), jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res0) < 1e-9
    x_sh64, x064 = np.asarray(x_sh), np.asarray(x0)
    scale = np.abs(x064).max()
    np.testing.assert_allclose(x_sh64, x064, atol=1e-8 * scale)


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

    # ---- default tier: every layout at ~10k DOF ----
    def test_rowshard_step_smoke(self, strip_dom_small):
        _check_rowshard_step(strip_dom_small, maxiter=1200)

    def test_rowshard_mg_step_smoke(self, strip_dom_small):
        _check_rowshard_mg(strip_dom_small)

    def test_refined_rowshard_step_smoke(self, strip_dom_small):
        _check_refined_rowshard(strip_dom_small)

    # ---- slow tier: the same checks at >=100k DOF ----
    @pytest.mark.slow
    def test_rowshard_step_matches_and_shards(self, strip_dom_100k):
        _check_rowshard_step(strip_dom_100k, maxiter=4000)

    @pytest.mark.slow
    def test_rowshard_mg_step_matches_and_converges(self, strip_dom_100k):
        _check_rowshard_mg(strip_dom_100k)

    @pytest.mark.slow
    def test_refined_rowshard_step_100k(self, strip_dom_100k):
        _check_refined_rowshard(strip_dom_100k)


def test_refined_rowshard_df32_mode():
    """The TPU production arithmetic (df32 two-float residuals), sharded:
    an f32 domain stepped with residual_mode='df32' over the mesh must
    converge below the f32 floor and match the single-device df32 step.
    Runs on the CPU mesh via the fusion-pinned jit (_df_jit)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    dom = _make_strip((72, 32), lattice_pad=8, dtype=jnp.float32)
    mesh = make_mesh(min(8, len(jax.devices())))
    dom.converge_tol = 1e-9
    dom.freeze_linear_tangent()
    dom.setup_mg(tune=False)
    dom.freeze_refined_residual()

    state = dom._runtime_state()
    sharded = shard_domain_state(state, mesh)
    kw = dict(sv_func=krylov.bicgstab, maxiter=100, max_refine=10,
              max_pass=1, precond="mg", residual_mode="df32")
    step_sh = dom.make_refined_step(rowshard_mesh=mesh, **kw)
    x0df = tf.df_from_f64(np.asarray(dom.x, np.float64))
    x_sh, _, res_sh, _ = step_sh(sharded, x0df, jnp.float64(0.0),
                                 jnp.float64(1.0))
    assert float(res_sh) < 1e-9

    step0 = dom.make_refined_step(**kw)
    x_0, _, res0, _ = step0(state, x0df, jnp.float64(0.0),
                            jnp.float64(1.0))
    assert float(res0) < 1e-9
    a = np.asarray(tf.df_to_f64(x_sh))
    b = np.asarray(tf.df_to_f64(x_0))
    np.testing.assert_allclose(a, b, atol=1e-8 * np.abs(b).max())


# ---------------------------------------------------------------------------
# unstructured scale-out: refined step + aux-space MG over the mesh
# ---------------------------------------------------------------------------

def _make_tet_thermal(nel=(6, 4, 4), lattice_pad=None, dtype=None,
                      seed=2):
    """Small UNSTRUCTURED tet fixture: a brick split into 5-tet cells
    with jittered interior vertices, so the control points do NOT land
    on a lattice (Morton fallback + ghost-cp scale-out padding) and the
    preconditioner is the aux-space hierarchy — the pikachu production
    path at suite size, no external mesh fixture needed."""
    L = (1.0, 0.7, 0.7)
    vert, conn = mf.make_brick(L, nel, shape="SIMPLEX")
    rng = np.random.default_rng(seed)
    h = min(L[d] / nel[d] for d in range(3))
    interior = np.ones(len(vert), bool)
    for d in range(3):
        interior &= (vert[:, d] > 1e-9) & (vert[:, d] < L[d] - 1e-9)
    vert = vert + 0.18 * h * interior[:, None] * (
        rng.random(vert.shape) - 0.5)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3) if dtype is None else FEM_Domain(3, dtype=dtype)
    wp = dom.add_workpiece(geo)
    bg = dom.add_boundary(wp, geo.boundary_facet_ids())
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -0.6 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg, 25.0 * Bilinear(T, 293.15 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    kw = {} if lattice_pad is None else {"lattice_pad": lattice_pad}
    dom.mesh_classical(itp_order=2, itg_order=2, **kw)
    dom.assemble_global_variables()
    dom.compile()
    mesh0 = dom.workpieces[wp].mesh
    assert mesh0.lattice_shape is None, "fixture must be unstructured"
    occ = mesh0.is_occupied
    real = np.ones(mesh0.n_cp, bool) if occ is None else occ
    Tf = np.where(real, 293.15 + 10 * rng.random(mesh0.n_cp), 0.0)
    sf = np.where(real, 1600.0 * rng.random(mesh0.n_cp), 0.0)
    dom.set_field(wp, "T", Tf)
    dom.set_field(wp, "s", sf)
    dom.refresh_fields()
    dom.assemble_x()
    return dom


@pytest.mark.parametrize(
    "smooth",
    [pytest.param("full", marks=pytest.mark.slow), "sparse"])
def test_refined_rowshard_auxmg_tet(smooth):
    """The unstructured production path, sharded: df32 refined step +
    frozen aux-space MG over the 8-device mesh must converge to 1e-9
    and match the single-device step.  The ghost-cp padding makes n_cp
    (and with it every vector and the dense storage) divide the mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(min(8, len(jax.devices())))
    dom = _make_tet_thermal(lattice_pad=mesh.devices.size)
    n = dom.pattern.basicfield_size
    assert n % mesh.devices.size == 0
    assert dom.pattern.offset_layout.n_storage % mesh.devices.size == 0
    dom.converge_tol = 1e-9
    dom.freeze_linear_tangent()
    dom.freeze_refined_residual()
    dom.setup_auxmg(smooth=smooth)

    state = dom._runtime_state()
    sharded = shard_domain_state(state, mesh)
    ref = sharded["refined"]
    assert not ref["A_hi"].sharding.is_fully_replicated
    assert not ref["b_hi"].sharding.is_fully_replicated

    kw = dict(sv_func=krylov.bicgstab, maxiter=80, max_refine=10,
              max_pass=1, precond="auxmg")
    step_sh = dom.make_refined_step(rowshard_mesh=mesh, **kw)
    args = (sharded, jnp.asarray(dom.x), jnp.float64(0.0),
            jnp.float64(1.0))
    _assert_collectives(step_sh.lower(*args).compile().as_text(),
                        "auxmg refined step")
    x_sh, _, res_sh, _ = step_sh(*args)
    assert float(res_sh) < 1e-9, float(res_sh)

    step0 = dom.make_refined_step(**kw)
    x0, _, res0, _ = step0(state, jnp.asarray(dom.x), jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res0) < 1e-9, float(res0)
    a, b = np.asarray(x_sh), np.asarray(x0)
    np.testing.assert_allclose(a, b, atol=1e-8 * np.abs(b).max())


def test_refined_rowshard_nested_slice_mesh():
    """Two-slice (DCN x ICI) layout on paper, exercised on the virtual
    CPU mesh: a nested ('slice', 'el') 2x4 mesh whose flattened axes
    row-shard the refined step (PERFORMANCE.md round-5 design note).
    Must converge and match the single-device step — GSPMD derives the
    hierarchical collectives from the nested sharding alone."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("slice", "el"))
    dom = _make_strip((72, 32), lattice_pad=8)
    dom.converge_tol = 1e-9
    dom.freeze_linear_tangent()
    dom.setup_mg(tune=False)
    dom.freeze_refined_residual()

    state = dom._runtime_state()
    sharded = shard_domain_state(state, mesh)
    ref = sharded["refined"]
    assert not ref["A_hi"].sharding.is_fully_replicated
    assert len(ref["b_hi"].sharding.device_set) == 8

    kw = dict(sv_func=krylov.bicgstab, maxiter=100, max_refine=10,
              max_pass=1, precond="mg")
    step_sh = dom.make_refined_step(rowshard_mesh=mesh, **kw)
    x_rep = jax.device_put(jnp.asarray(dom.x), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    x_sh, _, res_sh, _ = step_sh(sharded, x_rep, jnp.float64(0.0),
                                 jnp.float64(1.0))
    assert float(res_sh) < 1e-9

    step0 = dom.make_refined_step(**kw)
    x0, _, res0, _ = step0(state, jnp.asarray(dom.x), jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res0) < 1e-9
    np.testing.assert_allclose(
        np.asarray(x_sh), np.asarray(x0),
        atol=1e-8 * np.abs(np.asarray(x0)).max())
