"""Stress concentration plate: Abaqus .inp mesh import, component-wise
penalty symmetry BCs, stress recovery via gradient probing — vs Abaqus
S22 line data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import stress_concentration_2d as sc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(sc.REF_DIR), reason="Abaqus fixtures not available")


class TestStressConcentration2D:
    def test_s22_vs_abaqus(self):
        dom, geo, wp, p = sc.solve()
        for name, inside in (("2D_Abaqus_x.csv", lambda q: q[:, 0] < 3.99),
                             ("2D_Abaqus_y.csv", lambda q: q[:, 1] > 1.01)):
            pts, s22_ref = sc.abaqus_line(name)
            keep = inside(pts)
            got = sc.s22_at(dom, geo, wp, pts[keep], p)
            ok = ~np.isnan(got)
            assert ok.sum() >= 0.9 * keep.sum()
            err = np.abs(got[ok] - s22_ref[keep][ok])
            assert err.max() < 0.2    # nominal load = 1; coarse-mesh FEM
            assert err.mean() < 0.06  # vs FEM comparison

    def test_stress_concentration_factor(self):
        dom, geo, wp, p = sc.solve()
        # S22 near the hole edge on the symmetry line approaches ~3x
        pts = np.array([[3.92, 0.0], [3.8, 0.0], [3.6, 0.0]])
        s22 = sc.s22_at(dom, geo, wp, pts, p)
        assert s22[0] > 2.0          # strong concentration near the hole
        assert s22[0] > s22[1] > s22[2]  # decays away from the hole
