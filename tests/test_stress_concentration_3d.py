"""3D stress concentration block: Abaqus hex .inp import, component-wise
penalty symmetry BCs on three planes, S22 recovery — vs the reference's
Abaqus line oracles 3D_Abaqus_x.csv / 3D_Abaqus_y.csv
(examples/linear_elasticity/stress_concentration/3D_Script.jl)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import stress_concentration_3d as sc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(sc.REF_DIR), reason="Abaqus fixtures not available")


@pytest.mark.slow
class TestStressConcentration3D:
    """Slow tier (~9 min fixture: the fixed Abaqus hex mesh cannot be
    coarsened).  The default tier keeps the same code paths — .inp
    import, penalty BCs, stress recovery vs Abaqus lines — via
    test_stress_concentration.py (2D)."""

    @pytest.fixture(scope="class")
    def solution(self):
        return sc.solve()

    def test_s22_vs_abaqus(self, solution):
        dom, geo, wp, p = solution
        for name in ("3D_Abaqus_x.csv", "3D_Abaqus_y.csv"):
            pts, s22_ref = sc.abaqus_line(name)
            # points with r <= 1 sit inside the hole (paraview reports
            # nearest-element values there)
            keep = np.hypot(pts[:, 0], pts[:, 1]) > 1.15
            got = sc.s22_at(dom, geo, wp, pts[keep], p)
            ok = ~np.isnan(got)
            assert ok.sum() >= 0.9 * keep.sum()
            err = np.abs(got[ok] - s22_ref[keep][ok])
            # measured: max 0.056 / 0.047, mean 0.006 / 0.009
            assert err.max() < 0.1
            assert err.mean() < 0.02

    def test_concentration_near_hole(self, solution):
        dom, geo, wp, p = solution
        # S22 rises toward the hole edge along the x-line (y=0, z=0)
        pts = np.array([[1.25, 0.0, 0.0], [1.75, 0.0, 0.0],
                        [2.5, 0.0, 0.0]])
        s22 = sc.s22_at(dom, geo, wp, pts, p)
        assert s22[0] > 1.25
        assert s22[0] > s22[1] > s22[2]
        assert abs(s22[2] - 1.0) < 0.1   # far field ~ nominal load
