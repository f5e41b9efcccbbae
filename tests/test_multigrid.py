"""Lattice geometric multigrid (linsolve/multigrid.py).

The reference has no multigrid — its strong preconditioner is ILU(0)
(02_Preconditioner.jl:179-193), substituted here by a TPU-native GMG.
Tests: transfer-operator adjointness, *exactness* of the probed Galerkin
coarse operator against an explicitly computed dense R A P, convergence
of the MG-preconditioned Krylov solve against scipy, and the fully
jitted Newton step with precond='mg'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov, multigrid
from metafem.linsolve.block_offset import OffsetMatrix
from metafem.solver.domain import FEM_Domain


def _thermal_domain(nel=(8, 4), itp_order=2, itp_type="Serendipity"):
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    top = mf.select_facets(geo, lambda c: c[:, 1] > L2 - eps)
    bg_fix = dom.add_boundary(wp, ends)
    bg_top = dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    n = dom.sym("n")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bg_fix, 1000.0 * Bilinear(T, 1173.15 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bg_top, 50.0 * Bilinear(T, 323.15 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, 323.15 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=itp_order, itg_order=5, itp_type=itp_type)
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 500.0))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


def _tangent(dom):
    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    return A, residue


# ---------------------------------------------------------------------------
# transfer operators
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(7,), (8,), (9, 6), (5, 4, 7)])
def test_prolong_restrict_adjoint(shape):
    rng = np.random.default_rng(0)
    coarse = tuple((s + 1) // 2 for s in shape)
    C = 2
    xc = jnp.asarray(rng.standard_normal((C,) + coarse))
    yf = jnp.asarray(rng.standard_normal((C,) + shape))
    lhs = jnp.vdot(multigrid.prolong(xc, shape), yf)
    rhs = jnp.vdot(xc, multigrid.restrict(yf))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_prolong_interpolates_linear():
    # exact on linear functions at interior points (partition of unity)
    shape = (9,)
    xc = jnp.asarray(np.arange(5, dtype=np.float64))[None, :]
    out = np.asarray(multigrid.prolong(xc, shape))[0]
    np.testing.assert_allclose(out, np.arange(9) / 2.0, atol=1e-14)


def test_offset_decomposition():
    shape = (11, 7)
    ks = np.array([[2, -1], [0, 3], [-2, -2], [1, 0]])
    flat = ks[:, 0] * 7 + ks[:, 1]
    out = multigrid.decompose_offsets(flat, shape)
    np.testing.assert_array_equal(out, ks)


# ---------------------------------------------------------------------------
# Galerkin probing exactness
# ---------------------------------------------------------------------------

def test_probed_coarse_operator_is_exact_galerkin():
    dom = _thermal_domain(nel=(8, 4))
    A, _ = _tangent(dom)
    hier = multigrid.hierarchy_for_domain(dom, max_coarse=16)
    mask = multigrid.mask_for_domain(dom)
    state = multigrid.mg_setup(hier, A, mask)

    s_fine, s_coarse = hier.shapes[0], hier.shapes[1]
    nc = int(np.prod(s_coarse))
    nf = int(np.prod(s_fine))
    # dense (ghost-masked) prolongation by applying prolong to unit vecs
    m_np = (np.ones(nf) if mask is None
            else np.asarray(mask).reshape(-1))
    P = np.zeros((nf, nc))
    for j in range(nc):
        e = np.zeros(nc)
        e[j] = 1.0
        P[:, j] = m_np * np.asarray(
            multigrid.prolong(jnp.asarray(e.reshape((1,) + s_coarse)),
                              s_fine)).reshape(-1)
    A_dense = A.to_scipy().toarray()
    expected = P.T @ A_dense @ P

    got = np.zeros((nc, nc))
    coefs = np.asarray(state[1]["coefs"])
    grids = np.meshgrid(*[np.arange(s) for s in s_coarse], indexing="ij")
    strides = np.cumprod((1,) + s_coarse[:0:-1])[::-1]
    flat = sum(g * s for g, s in zip(grids, strides)).reshape(-1)
    for i, off in enumerate(hier.offsets):
        ok = np.ones(s_coarse, dtype=bool)
        for a, o in enumerate(off):
            idx = grids[a] + o
            ok &= (idx >= 0) & (idx < s_coarse[a])
        ok = ok.reshape(-1)
        r = flat[ok]
        c = r + sum(o * s for o, s in zip(off, strides))
        got[r, c] = coefs[i, 0, 0].reshape(-1)[ok]

    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-8)


# ---------------------------------------------------------------------------
# solve quality
# ---------------------------------------------------------------------------

def test_mg_preconditioned_solve_matches_scipy_and_is_fast():
    import scipy.sparse.linalg as spla
    dom = _thermal_domain(nel=(48, 24))
    A, residue = _tangent(dom)
    hier = multigrid.hierarchy_for_domain(dom)
    state = multigrid.mg_setup(hier, A, multigrid.mask_for_domain(dom))
    op = multigrid.MGOperator(A, state, hier)

    tol = 1e-10
    y, iters, res = krylov.bicgstab(op, residue, tol=tol, maxiter=200)
    x = op.apply_m(y)
    true_res = np.linalg.norm(np.asarray(residue)
                              - np.asarray(A.mv(x)))
    n = residue.shape[0]
    assert true_res / np.sqrt(n) < 1e-8
    # MG should converge in a handful of iterations (Jacobi needs 100s)
    assert int(iters) < 40

    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.asarray(residue))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(np.asarray(x), x_ref,
                               atol=5e-7 * scale, rtol=5e-6)


def test_mg_iteration_count_is_mesh_independent():
    counts = []
    # (64, 32) adds ~25 s of f64 CPU work for the same h-independence
    # conclusion the (16, 8) -> (48, 24) pair already demonstrates
    for nel in [(16, 8), (48, 24)]:
        dom = _thermal_domain(nel=nel)
        A, residue = _tangent(dom)
        hier = multigrid.hierarchy_for_domain(dom)
        state = multigrid.mg_setup(hier, A,
                                   multigrid.mask_for_domain(dom))
        op = multigrid.MGOperator(A, state, hier)
        _, iters, _ = krylov.bicgstab(op, residue, tol=1e-9, maxiter=300)
        counts.append(int(iters))
    # h-independence: finest should need at most ~2x the coarsest count
    assert counts[-1] <= 2 * counts[0] + 5, counts


def _elastic_domain_2d(nel=(24, 6)):
    """Plane-strain cantilever: 2 coupled displacement channels (C=2)."""
    L, H = 4.0, 1.0
    vert, conn = mf.make_square((L, H), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    eps_g = 1e-9
    left = mf.select_facets(geo, lambda c: c[:, 0] < eps_g)
    right = mf.select_facets(geo, lambda c: c[:, 0] > L - eps_g)
    bg_fix = dom.add_boundary(wp, left)
    bg_load = dom.add_boundary(wp, right)

    E, nu = 1.0, 0.3
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    d = dom.internal_var("d")
    sl = dom.external_var("sl", "CONTROLPOINT_VAR", "SYMMETRIC_TENSOR")
    n = dom.sym("n")
    delta = dom.sym("delta")
    i, j, m = mf.indices("i j m")
    eps = dom.define("eps", [i, j], (d[i].d(j) + d[j].d(i)) / 2.0)
    sig = dom.define("sig", [i, j],
                     lam * delta[i, j] * eps[m, m] + 2.0 * mu * eps[i, j])
    dom.assign_workpiece_weakform(wp, -Bilinear(eps[i, j], sig[i, j]))
    dom.assign_boundary_weakform(wp, bg_fix,
                                 1e3 * E * Bilinear(d[i], -d[i]))
    dom.assign_boundary_weakform(wp, bg_load,
                                 Bilinear(d[i], sl[i, j] * n[j]))
    dom.initialize_local_assembly()
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "sl3", np.full(mesh.n_cp, 1e-3))   # shear sigma_xy
    dom.refresh_fields()
    dom.assemble_x()
    return dom


def test_mg_vector_channels_elasticity():
    """C=2 coupled channels: MG must beat Jacobi by an order of magnitude
    and agree with scipy (cross-channel Galerkin coefficients probed)."""
    import scipy.sparse.linalg as spla
    dom = _elastic_domain_2d()
    A, residue = _tangent(dom)
    hier = multigrid.hierarchy_for_domain(dom)
    assert hier.channels == 2
    state = multigrid.mg_setup(hier, A, multigrid.mask_for_domain(dom))
    op = multigrid.MGOperator(A, state, hier)
    y, iters_mg, _ = krylov.bicgstab(op, residue, tol=1e-10, maxiter=300)
    x = op.apply_m(y)
    n = residue.shape[0]
    true_res = float(jnp.linalg.norm(residue - A.mv(x))) / np.sqrt(n)
    assert true_res < 1e-8

    from metafem.linsolve.precond import pr_jacobi
    Aj, _ = pr_jacobi(A, None)
    _, iters_j, _ = krylov.bicgstab(Aj, residue, tol=1e-10, maxiter=3000)
    assert int(iters_mg) * 5 < int(iters_j), (int(iters_mg), int(iters_j))

    x_ref = spla.spsolve(A.to_scipy().tocsc(), np.asarray(residue))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6 * scale)


def _transient_thermal(nel=(16, 8)):
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    bg = dom.add_boundary(wp, ends)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    dt_ = T.dt()
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s)
        - 1.0e5 * Bilinear(T, dt_))
    dom.assign_boundary_weakform(wp, bg, 1000.0 * Bilinear(T, 500.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.dt = 0.5
    dom.converge_tol = 1e-10
    return dom


def test_frozen_tangent_and_mg_match_per_step_setup():
    """freeze_linear_tangent + setup_mg (cross-step caching for static
    geometry) must reproduce the per-step-assembled path bit-for-bit in
    effect: same converged step."""
    dom = _transient_thermal()
    state = dom._runtime_state()
    step_ref = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=80,
                                    max_newton=6, max_pass=2,
                                    precond="mg")
    x_ref, _, res_ref, _ = step_ref(state, dom.x, jnp.float64(0.0),
                                    jnp.float64(0.5))

    dom.freeze_linear_tangent()
    dom.setup_mg()
    state2 = dom._runtime_state()
    step_fz = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=80,
                                   max_newton=6, max_pass=2,
                                   precond="mg", static_k_linear=True,
                                   reuse_mg=True)
    x_fz, _, res_fz, _ = step_fz(state2, dom.x, jnp.float64(0.0),
                                 jnp.float64(0.5))
    assert float(res_ref) < 1e-10 and float(res_fz) < 1e-10
    scale = np.abs(np.asarray(x_ref)).max()
    np.testing.assert_allclose(np.asarray(x_fz), np.asarray(x_ref),
                               atol=1e-9 * scale)

    # the frozen K_linear_td recombination must equal a direct assembly
    ga = dom.time_discretization
    ga.update_time(0.5, dom.pattern.max_time_level)
    st = dom._runtime_state()
    K_direct = np.asarray(dom._k_linear(st))
    Kp = np.asarray(st["K_params"])
    K_comb = np.einsum("t,ts->s", Kp, np.asarray(st["K_linear_td"]))
    ghost = st.get("ghost_diag")
    if ghost is not None:
        K_comb = K_comb + np.asarray(ghost)
    np.testing.assert_allclose(K_comb, K_direct, rtol=1e-12,
                               atol=1e-12 * np.abs(K_direct).max())


def test_jitted_step_mg_matches_jacobi_path():
    dom = _thermal_domain(nel=(16, 8))
    dom.converge_tol = 1e-9
    state = dom._runtime_state()

    step_j = dom.make_jitted_step(sv_func=krylov.bicgstabl, s=2,
                                  maxiter=800, max_newton=6, max_pass=2)
    step_m = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=60,
                                  max_newton=6, max_pass=2, precond="mg")
    x_j, _, res_j, _ = step_j(state, dom.x, jnp.float64(0.0),
                              jnp.float64(1.0))
    x_m, _, res_m, it_m = step_m(state, dom.x, jnp.float64(0.0),
                                 jnp.float64(1.0))
    assert float(res_m) < 1e-9
    assert float(res_j) < 1e-9
    scale = np.abs(np.asarray(x_j)).max()
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j),
                               atol=1e-6 * scale)
