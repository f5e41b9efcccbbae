"""J2 plasticity: integration-point user callbacks with history state
threaded through the jitted state pytree.  Oracle: the reference's
hard-coded analytic elongation sequences — all three hardening combos,
FULL 15-17-point cyclic paths including unloading, reverse yield and
the Bauschinger effect (J2Plasticity.jl:222-230)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import j2_plasticity as j2  # noqa: E402


class TestJ2Plasticity:
    @pytest.mark.parametrize(
        "gi",
        [pytest.param(0, marks=pytest.mark.slow), 1,
         pytest.param(2, marks=pytest.mark.slow)],
        ids=["isotropic", "mixed", "kinematic"])
    def test_full_cyclic_sequence(self, gi):
        """Full cyclic load path vs the analytic elongations — exercises
        first yield, hardening, elastic unloading, reverse yield and
        (for Eb > 0) the Bauschinger shift of the reverse yield point."""
        dom, wp, p = j2.build(e_number=2)
        grp = j2.SEQUENCES[gi]
        d1s = j2.run_load_sequence(dom, wp, p, grp["s"], Y_initial=100,
                                   Eb=grp["Eb"], Ep=grp["Ep"])
        np.testing.assert_allclose(d1s, grp["d1"], atol=1.5e-3)

    def test_hardening_state_evolution(self):
        """History-variable behavior per hardening model: isotropic moves
        Y and not b; kinematic moves b and not Y."""
        dom, wp, p = j2.build(e_number=2)
        grp = j2.SEQUENCES[0]  # Eb=0, Ep=Ey/2 (isotropic)
        j2.run_load_sequence(dom, wp, p, grp["s"][:7], Y_initial=100,
                             Eb=grp["Eb"], Ep=grp["Ep"])
        assert np.abs(dom.user_state["ep"]).max() > 1e-4
        assert dom.user_state["Y"].max() > 100.0
        np.testing.assert_allclose(dom.user_state["b"], 0.0)

        grp = j2.SEQUENCES[2]  # Eb=Ey/2, Ep=0 (pure kinematic)
        j2.run_load_sequence(dom, wp, p, grp["s"][:5], Y_initial=100,
                             Eb=grp["Eb"], Ep=grp["Ep"])
        assert np.abs(dom.user_state["b"]).max() > 1.0
        np.testing.assert_allclose(dom.user_state["Y"], 100.0)
