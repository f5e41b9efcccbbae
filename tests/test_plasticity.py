"""J2 plasticity: integration-point user callbacks with history state
threaded through the jitted state pytree.  Oracle: the reference's
hard-coded analytic elongation sequences (J2Plasticity.jl:222-230)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import j2_plasticity as j2  # noqa: E402


class TestJ2Plasticity:
    def test_isotropic_hardening_loading(self):
        dom, wp, p = j2.build(e_number=2)
        grp = j2.SEQUENCES[0]  # Eb=0, Ep=Ey/2
        n = 7  # through first yield and hardening up to the peak load
        d1s = j2.run_load_sequence(dom, wp, p, grp["s"][:n],
                                   Y_initial=100, Eb=grp["Eb"],
                                   Ep=grp["Ep"])
        np.testing.assert_allclose(d1s, grp["d1"][:n], atol=1.5e-3)
        # plastic history accumulated after yield
        assert np.abs(dom.user_state["ep"]).max() > 1e-4
        assert dom.user_state["Y"].max() > 100.0  # isotropic hardening

    def test_kinematic_hardening_short(self):
        dom, wp, p = j2.build(e_number=2)
        grp = j2.SEQUENCES[2]  # Eb=Ey/2, Ep=0 (pure kinematic)
        n = 5
        d1s = j2.run_load_sequence(dom, wp, p, grp["s"][:n],
                                   Y_initial=100, Eb=grp["Eb"],
                                   Ep=grp["Ep"])
        np.testing.assert_allclose(d1s, grp["d1"][:n], atol=1.5e-3)
        assert np.abs(dom.user_state["b"]).max() > 1.0  # backstress moved
        np.testing.assert_allclose(dom.user_state["Y"], 100.0)  # Y fixed
