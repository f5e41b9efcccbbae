"""3D cylinder-in-duct flow vs COMSOL line data — the reference's
unstructured incompressible-flow example (examples/incompressible_flow/
cylinder_flow/3D_MetaFEM_Script.jl), promoted into the suite.

Exercises: .mphtxt tet mesh reader, facet selection by center, 3D
SUPG/PSPG-stabilized mixed u-p weak forms with normals, the IDR(s)
iterative solve, and point probing against the COMSOL oracle.

Suite budget: the test runs at itp_order=1 (order-1 velocity can't
fully resolve the parabolic duct profile, so the bar is 0.08 max /
0.04 mean against U_max = 0.45); the example's __main__ runs the full
order-2 configuration, which measures max |du| = 0.0086 vs COMSOL.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import cylinder_flow_3d as cf  # noqa: E402

from metafem.mesh.probe import probe_field  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(cf.MESH_PATH),
    reason="reference COMSOL mesh not available")


def test_cylinder_flow_vs_comsol():
    dom, geo, wp = cf.build(itp_order=1, itg_order=3)
    res = cf.solve(dom, geo, wp)
    assert res < 1e-6
    mesh = dom.workpieces[wp].mesh
    raw = cf.comsol_line("COMSOL_y2.csv")
    mask = raw[:, 4] > 0.5
    pts = raw[mask, 6:9]
    et = dom.workpieces[wp].disc.element_type
    got = probe_field(geo, mesh, et, "u1", pts)
    ok = ~np.isnan(got)
    assert ok.sum() >= 40               # the line lies inside the duct
    err = np.abs(got[ok] - raw[mask, 0][ok])
    assert err.max() < 0.08             # U_max = 0.45
    assert err.mean() < 0.04
    assert np.isfinite(mesh.fields["p"]).all()
