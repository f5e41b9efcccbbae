"""Pikachu 3D thermal: tet meshes at scale (~24k control points), mphtxt
reader, COMSOL oracle, transient generalized-alpha stepping."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import pikachu_3d  # noqa: E402
from metafem.mesh.probe import probe_field  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(pikachu_3d.MESH_PATH),
    reason="reference COMSOL mesh not available")


@pytest.fixture(scope="module")
def static_solution():
    dom, geo, mesh, res = pikachu_3d.solve_static()
    return dom, geo, mesh, res


class TestPikachuStatic:
    def test_converged(self, static_solution):
        _, _, _, res = static_solution
        assert res < 1e-6

    def test_vs_comsol_lines(self, static_solution):
        dom, geo, mesh, _ = static_solution
        et = dom.workpieces[0].disc.element_type
        for arc, temp, pts in pikachu_3d.comsol_lines():
            got = probe_field(geo, mesh, et, "T", pts)
            ok = ~np.isnan(got)
            assert ok.sum() > 0.8 * len(pts)
            err = np.abs(got[ok] - temp[ok])
            assert err.max() < 0.1  # Kelvin, on a ~10 K range


class TestPikachuTransient:
    def test_heating_toward_steady(self, static_solution):
        _, _, mesh_s, _ = static_solution
        T_steady_max = mesh_s.fields["T"].max()

        dom, geo, mesh = pikachu_3d.build(dynamic=True, C=4.184e3)
        dom.time_discretization = \
            pikachu_3d.GeneralAlpha.dissipative()
        dom.dt = 200.0
        maxima = [mesh.fields["T"].max()]
        for _ in range(3):
            dom.update_one_step(max_iter=3)
            dom.dessemble_x()
            maxima.append(mesh.fields["T"].max())
        # monotone heating, bounded by (and approaching) the steady state
        # (0.05 K slack: both solves stop at a 1e-6 normalized residual)
        assert all(b > a for a, b in zip(maxima, maxima[1:]))
        assert maxima[-1] < T_steady_max + 0.05
        assert maxima[-1] > pikachu_3d.T_ENV + 1.0
