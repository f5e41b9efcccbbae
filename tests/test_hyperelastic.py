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
    def test_tension_runs(self):
        dom, wp, p = hyperelastic_3d.build(e_number=1,
                                           material="mooney_rivlin")
        P1s, d1s = hyperelastic_3d.run_loading(
            dom, wp, 1e6, 1e7, total_steps=2, sigma_step=2e5)
        assert np.isfinite(d1s).all()
        assert 0 < d1s[0] < d1s[1]  # monotone stretch under growing load
