"""Linear elasticity cantilever: vector DOF blocks, tensor definitions
(Kronecker delta, dumb-index contraction), symmetric-tensor boundary loads.
Oracles are the analytic formulas the reference uses
(cantilever/3D_Script.jl:116-151)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))
import cantilever_3d  # noqa: E402


class TestCantilever:
    def test_shear_tip_load(self):
        dom, mesh, res, p = cantilever_3d.solve(e_number=2, verbose=False)
        assert res < 1e-5 * 4.4e3  # converged in one Newton step (linear)
        xs, d2 = cantilever_3d.midline(mesh, "d2")
        I = p["h"] ** 3 / 12.0
        ana = (p["sigma"] * p["h"] / (6 * p["E"] * I)
               * (3 * p["L"] - xs) * xs ** 2)
        err = np.abs(d2 - ana).max() / np.abs(ana).max()
        assert err < 0.02

    def test_axial_load(self):
        # uniform traction sigma_xx -> u1(x) = sigma x / E exactly
        dom, mesh, res, p = cantilever_3d.solve(e_number=2,
                                                load_case="axial")
        xs, d1 = cantilever_3d.midline(mesh, "d1")
        ana = p["sigma"] * xs / p["E"]
        err = np.abs(d1 - ana).max() / np.abs(ana).max()
        assert err < 5e-3

    def test_local_assembly_blocks(self):
        dom, mesh, res, p = cantilever_3d.solve(e_number=2)
        la = dom.workpieces[0].local_assembly
        assert la.basic_vars == ["d1", "d2", "d3"]
        # full 3x3 variable coupling from the elasticity tensor
        assert len(la.sparse_mapping) == 9
        # symmetric-tensor external columns were discovered and allocated
        assert "sl6" in mesh.fields and "s22" in mesh.fields
