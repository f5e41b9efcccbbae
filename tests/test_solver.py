"""Solver-stack tests: local assembly IR, geometry tables, assembled K
against analytic stiffness, time integration accuracy."""

import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.mesh.builders import make_square, select_facets
from metafem.mesh.ref_geometry import construct_total_mesh
from metafem.solver.domain import FEM_Domain
from metafem.solver.time_domain import GeneralAlpha


def _thermal_domain(nel=(2, 1), itp_order=1, itp_type="Lagrange",
                    k=1.0, with_boundary=False):
    L = (float(nel[0]), float(nel[1]))
    vert, conn = make_square(L, nel)
    geo = construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -k * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    if with_boundary:
        n = dom.sym("n")
        bg = dom.add_boundary(wp, geo.boundary_facet_ids())
        dom.assign_boundary_weakform(
            wp, bg, 10.0 * Bilinear(T, 1.0 - T)
            + k * Bilinear(T, n[i] * T.d(i)))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=itp_order, itg_order=3, itp_type=itp_type)
    dom.assemble_global_variables()
    dom.compile()
    return dom, wp


class TestLocalAssembly:
    def test_linear_split_thermal(self):
        dom, wp = _thermal_domain()
        la = dom.workpieces[wp].local_assembly
        wf = la.assembled_weakform
        # -k Bilinear(T,i T,i): gradients wrt T;1 and T;2 are constants ->
        # linear; Bilinear(T, s): no gradient (s external)
        assert la.basic_vars == ["T"]
        assert len(wf.linear_gradients) == 2
        assert len(wf.nonlinear_gradients) == 0
        assert len(wf.residues) == 3  # T;1, T;2 and T dual words
        assert la.sparse_mapping == {(0, 0): 0}
        assert la.max_time_level == 0

    def test_nonlinear_split_radiation(self):
        # em*sb*Bilinear(T, Tenv^4 - T^4) has a T-dependent gradient
        dom = FEM_Domain(2)
        vert, conn = make_square((1.0, 1.0), (1, 1))
        geo = construct_total_mesh(vert, conn)
        wp = dom.add_workpiece(geo)
        T = dom.internal_var("T")
        i = mf.index("i")
        dom.assign_workpiece_weakform(
            wp, -1.0 * Bilinear(T.d(i), T.d(i))
            + Bilinear(T, 100.0 - T ** 4))
        dom.initialize_local_assembly()
        la = dom.workpieces[wp].local_assembly
        wf = la.assembled_weakform
        assert len(wf.linear_gradients) == 2
        assert len(wf.nonlinear_gradients) == 1


class TestGeometry:
    def test_weights_sum_to_volume(self):
        dom, wp = _thermal_domain(nel=(3, 2))
        w = np.asarray(dom.state["wp"][wp]["el"]["weights"])
        # each element is a unit square
        np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-12)

    def test_partition_of_unity_and_gradients(self):
        dom, wp = _thermal_domain(nel=(2, 2), itp_order=2)
        vals = np.asarray(dom.state["wp"][wp]["el"]["itg_vals"])
        # mode 0 (value): sum over shape functions = 1 at every quad point
        np.testing.assert_allclose(vals[..., 0].sum(axis=2), 1.0, atol=1e-12)
        # gradient modes: sum over shape functions = 0
        np.testing.assert_allclose(vals[..., 1].sum(axis=2), 0.0, atol=1e-10)
        np.testing.assert_allclose(vals[..., 2].sum(axis=2), 0.0, atol=1e-10)

    def test_physical_gradient_exactness(self):
        # gradient of the linear field f = 2x + 3y must be (2, 3) everywhere
        dom, wp = _thermal_domain(nel=(2, 1), itp_order=2)
        mesh = dom.workpieces[wp].mesh
        f = 2.0 * mesh.cp_coords[:, 0] + 3.0 * mesh.cp_coords[:, 1]
        vals = np.asarray(dom.state["wp"][wp]["el"]["itg_vals"])
        el_cp = mesh.el_cp
        modes = dom.workpieces[wp].disc.sd_modes
        mx, my = modes.index((1, 0)), modes.index((0, 1))
        fx = np.einsum("eqa,ea->eq", vals[..., mx], f[el_cp])
        fy = np.einsum("eqa,ea->eq", vals[..., my], f[el_cp])
        np.testing.assert_allclose(fx, 2.0, atol=1e-10)
        np.testing.assert_allclose(fy, 3.0, atol=1e-10)

    def test_boundary_normals_outward(self):
        dom, wp = _thermal_domain(nel=(2, 2), with_boundary=True)
        mesh = dom.workpieces[wp].mesh
        center = mesh.cp_coords.mean(axis=0)
        for part in dom.state["wp"][wp]["bdy"][0]:
            normals = np.asarray(part["normals"])        # [F, nq, 2]
            el_cp = np.asarray(part["el_cp"])
            el_centers = mesh.cp_coords[el_cp].mean(axis=1)  # [F, 2]
            outward = el_centers - center                # points outward
            dots = np.einsum("fqd,fd->fq", normals, outward)
            assert (dots > 0).all()

    def test_boundary_weights_sum_to_perimeter(self):
        dom, wp = _thermal_domain(nel=(4, 2), with_boundary=True)
        total = sum(float(np.asarray(p["weights"]).sum())
                    for p in dom.state["wp"][wp]["bdy"][0])
        np.testing.assert_allclose(total, 2 * (4.0 + 2.0), rtol=1e-12)


def _q4_laplace(coords):
    """Analytic Q4 unit-square Laplace stiffness in the given node order:
    2/3 diagonal, -1/6 edge neighbors, -1/3 diagonal opposites."""
    n = len(coords)
    K = np.zeros((n, n))
    for a in range(n):
        for b in range(n):
            d2 = ((coords[a] - coords[b]) ** 2).sum()
            K[a, b] = {0.0: 2 / 3, 1.0: -1 / 6, 2.0: -1 / 3}[round(d2, 9)]
    return K


class TestAssembly:
    def test_single_element_stiffness(self):
        dom, wp = _thermal_domain(nel=(1, 1))
        state = dom._runtime_state()
        state["K_linear"] = dom._k_linear(state)
        _, K_total = dom._res_k(state)
        pat = dom.pattern
        K_logical = np.asarray(K_total)[pat.offset_layout.storage_of_slot]
        K_dense = np.zeros((4, 4))
        K_dense[pat.coo_rows, pat.coo_cols] = K_logical
        # weak form is -k * Bilinear -> minus the Laplace stiffness
        expected = -_q4_laplace(dom.workpieces[wp].mesh.cp_coords)
        np.testing.assert_allclose(K_dense, expected, atol=1e-12)

    def test_residue_equals_K_times_x(self):
        # the domain form is linear in T, so residue(x) = K @ x exactly
        dom, wp = _thermal_domain(nel=(3, 2))
        mesh = dom.workpieces[wp].mesh
        rng = np.random.default_rng(0)
        Tvals = rng.normal(size=mesh.n_cp)
        dom.set_field(wp, "T", Tvals)
        dom.refresh_fields()
        dom.assemble_x()
        state = dom._runtime_state()
        state["x_star"] = dom.x
        state["K_linear"] = dom._k_linear(state)
        residue, K_total = dom._res_k(state)
        pat = dom.pattern
        K_logical = np.asarray(K_total)[pat.offset_layout.storage_of_slot]
        K_dense = np.zeros((pat.basicfield_size, pat.basicfield_size))
        K_dense[pat.coo_rows, pat.coo_cols] = K_logical
        np.testing.assert_allclose(np.asarray(residue), K_dense @ Tvals,
                                   atol=1e-10)

    def test_csr_pattern_consistency(self):
        dom, wp = _thermal_domain(nel=(3, 3), with_boundary=True)
        pat = dom.pattern
        rows, cols = pat.rows_sorted, pat.cols_sorted
        # strictly increasing (row, col) keys: the COO is duplicate-free
        keys = rows.astype(np.int64) * pat.basicfield_size + cols
        assert (np.diff(keys) > 0).all()
        assert pat.row_ptr[-1] == pat.nnz
        np.testing.assert_array_equal(pat.coo_rows[pat.csr_perm], rows)
        # diagonal positions index actual diagonal entries
        d = pat.diag_pos
        assert (d >= 0).all()
        np.testing.assert_array_equal(rows[d], np.arange(pat.basicfield_size))
        np.testing.assert_array_equal(cols[d], np.arange(pat.basicfield_size))


class TestTimeIntegration:
    @pytest.mark.parametrize("dissipative", [False, True])
    def test_exponential_decay(self, dissipative):
        # weak form Bilinear(T, T_t + lam T) = 0 -> T(t) = T0 exp(-lam t)
        lam = 0.7
        vert, conn = make_square((1.0, 1.0), (1, 1))
        geo = construct_total_mesh(vert, conn)
        dom = FEM_Domain(2)
        wp = dom.add_workpiece(geo)
        T = dom.internal_var("T")
        dom.assign_workpiece_weakform(
            wp, Bilinear(T, T.dt() + lam * T))
        dom.initialize_local_assembly()
        dom.mesh_classical(itp_order=1, itg_order=3)
        dom.assemble_global_variables()
        dom.compile()
        if dissipative:
            dom.time_discretization = GeneralAlpha.dissipative()
        dom.converge_tol = 1e-12
        dom.linear_solver = dom.make_direct_solver()
        mesh = dom.workpieces[wp].mesh
        dom.set_field(wp, "T", np.ones(mesh.n_cp))
        # consistent initial rate (the reference likewise relies on the
        # user-set T_t column; without it the first step is perturbed)
        dom.set_field(wp, "T_t", np.full(mesh.n_cp, -lam))
        dom.assemble_x()
        dom.dt = 0.05
        for _ in range(10):
            dom.update_one_step(max_iter=3)
        dom.dessemble_x()
        exact = np.exp(-lam * 0.5)
        got = dom.workpieces[wp].mesh.fields["T"]
        tol = 0.02 if dissipative else 1e-4  # BE is O(dt), midpoint O(dt^2)
        np.testing.assert_allclose(got, exact, rtol=tol)


class TestThermal2DIntegration:
    def test_vs_featool(self):
        import sys
        import os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                        "examples"))
        import thermal_2d

        dom, mesh, res = thermal_2d.solve(nel=(20, 10))
        assert res < 1e-6
        ys, Ts = thermal_2d.midline_temperature(mesh)
        Ti = np.interp(thermal_2d.FEATOOL_Y, ys, Ts)
        err = np.abs(Ti - thermal_2d.FEATOOL_T) / thermal_2d.FEATOOL_T
        assert err.max() < 0.01


class TestJittedStep:
    def test_matches_host_loop(self):
        import jax.numpy as jnp
        dom, wp = _thermal_domain(nel=(4, 3), with_boundary=True)
        mesh = dom.workpieces[wp].mesh
        dom.converge_tol = 1e-10
        dom.set_field(wp, "T", np.full(mesh.n_cp, 0.5))
        dom.refresh_fields()
        dom.assemble_x()
        x0 = dom.x

        res_host = dom.update_one_step(max_iter=6)
        x_host = np.asarray(dom.x)

        dom.x = x0
        dom.t -= dom.dt
        res_jit = dom.update_one_step_jit(max_iter=6, maxiter=5000)
        x_jit = np.asarray(dom.x)
        assert res_jit < 1e-9
        np.testing.assert_allclose(x_jit, x_host, rtol=1e-7, atol=1e-9)
