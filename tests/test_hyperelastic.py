"""Hyperelasticity: symbolic tensor derivatives P = d(W, F), Levi-Civita
determinant, log-energy terms, runtime-changeable global material
constants.  Oracle: analytic homogeneous uniaxial Neo-Hookean response."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import hyperelastic_3d  # noqa: E402


@pytest.fixture(scope="module")
def nh_domain():
    return hyperelastic_3d.build(e_number=2)


class TestNeoHookean:
    def test_uniaxial_vs_analytic(self, nh_domain):
        dom, wp, p = nh_domain
        mu, lam = 1e6, 1e6
        P1s, d1s = hyperelastic_3d.run_loading(
            dom, wp, mu, lam, total_steps=3, sigma_step=4e5)
        ana = np.array([hyperelastic_3d.analytic_uniaxial_nh(s, mu, lam)
                        for s in P1s])
        err = np.abs(d1s - ana) / np.abs(ana)
        assert err.max() < 0.02

    def test_global_vars_changeable_without_recompile(self, nh_domain):
        # same jitted updaters, different material: a stiffer lambda must
        # give a smaller displacement
        dom, wp, p = nh_domain
        _, d_soft = hyperelastic_3d.run_loading(
            dom, wp, 1e6, 1e6, total_steps=1, sigma_step=4e5)
        _, d_stiff = hyperelastic_3d.run_loading(
            dom, wp, 1e6, 2e8, total_steps=1, sigma_step=4e5)
        assert d_stiff[-1] < d_soft[-1]

    def test_derivative_tensor_symmetrizes(self, nh_domain):
        dom, wp, p = nh_domain
        # d(W, F) materialized derivative tensors were cached in the table
        assert any(name.startswith("D_W__F")
                   for (name, *_rest) in dom.tensor_table.tensors)


class TestMooneyRivlin:
    def test_uniaxial_vs_analytic(self):
        """Quantitative oracle: the analytic tensile curve the reference
        plots against (static_Mooney_Rivlin.jl:128-139), first setup
        (C10=1e6, C01=1e6, lam=1e8)."""
        dom, wp, p = hyperelastic_3d.build(e_number=1,
                                           material="mooney_rivlin")
        c10, c01, lam = 1e6, 1e6, 1e8
        P1s, d1s = hyperelastic_3d.run_loading(
            dom, wp, 2 * (c10 + c01), lam, total_steps=3,
            sigma_step=4e5, c10=c10, c01=c01)
        ana = np.array([hyperelastic_3d.analytic_uniaxial_mr(
            s, c10, c01, lam) for s in P1s])
        err = np.abs(d1s - ana) / np.abs(ana)
        # measured ~2.3% systematic: the clamped end (all three
        # components penalty-fixed, as in the reference) blocks lateral
        # contraction locally, stiffening vs the free-lateral analytic
        # curve — more visible here than for Neo-Hookean because
        # lam = 1e8 is near-incompressible
        assert err.max() < 0.04, err

    def test_c01_stiffens_response(self):
        dom, wp, p = hyperelastic_3d.build(e_number=1,
                                           material="mooney_rivlin")
        _, d_a = hyperelastic_3d.run_loading(
            dom, wp, 4e6, 1e8, total_steps=1, sigma_step=4e5,
            c10=1e6, c01=1e6)
        _, d_b = hyperelastic_3d.run_loading(
            dom, wp, 12e6, 1e8, total_steps=1, sigma_step=4e5,
            c10=1e6, c01=5e6)
        assert 0 < d_b[-1] < d_a[-1]
