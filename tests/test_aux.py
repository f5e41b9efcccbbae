"""Aux subsystems: checkpoint/resume, VTK output, memory ledger."""

import os
import sys

import numpy as np
import pytest

import metafem as mf
from metafem import Bilinear
from metafem.io import write_vtk
from metafem.io.checkpoint import load_checkpoint, save_checkpoint
from metafem.solver.domain import FEM_Domain
from metafem.utils import memory_report, phase_timer


def _make_transient_domain():
    vert, conn = mf.make_square((1.0, 1.0), (3, 3))
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2)
    wp = dom.add_workpiece(geo)
    T = dom.internal_var("T")
    lam = dom.external_var("lam", "GLOBAL_VAR")
    dom.assign_workpiece_weakform(wp, Bilinear(T, T.dt() + lam * T))
    dom.global_vars["lam"] = 0.7
    dom.initialize_local_assembly()
    # NB: order-2 elements need itg_order >= 4 for a full-rank mass matrix
    dom.mesh_classical(itp_order=2, itg_order=5)
    dom.assemble_global_variables()
    dom.compile()
    dom.converge_tol = 1e-12
    dom.linear_solver = dom.make_direct_solver()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.ones(mesh.n_cp))
    dom.set_field(wp, "T_t", np.full(mesh.n_cp, -0.7))
    dom.assemble_x()
    dom.dt = 0.05
    return dom, wp


class TestCheckpoint:
    def test_save_load_resume_bitexact(self, tmp_path):
        dom, wp = _make_transient_domain()
        for _ in range(3):
            dom.update_one_step(max_iter=3)
        dom.dessemble_x()
        dom.user_state = {"hist": np.arange(4.0), "nested": {"Y": 2.5}}
        ckpt = str(tmp_path / "state.npz")
        save_checkpoint(dom, ckpt)
        # continue the original 2 more steps
        for _ in range(2):
            dom.update_one_step(max_iter=3)
        x_expected = np.asarray(dom.x)

        # fresh domain, restore, continue identically
        dom2, wp2 = _make_transient_domain()
        meta = load_checkpoint(dom2, ckpt)
        assert meta["t"] == pytest.approx(0.15)
        assert np.allclose(dom2.user_state["hist"], np.arange(4.0))
        assert dom2.user_state["nested"]["Y"] == 2.5
        for _ in range(2):
            dom2.update_one_step(max_iter=3)
        np.testing.assert_array_equal(np.asarray(dom2.x), x_expected)

    def test_shape_mismatch_rejected(self, tmp_path):
        dom, wp = _make_transient_domain()
        ckpt = str(tmp_path / "s.npz")
        save_checkpoint(dom, ckpt)
        vert, conn = mf.make_square((1.0, 1.0), (4, 4))
        geo = mf.construct_total_mesh(vert, conn)
        dom3 = FEM_Domain(2)
        wpx = dom3.add_workpiece(geo)
        T = dom3.internal_var("T")
        dom3.assign_workpiece_weakform(wpx, Bilinear(T, T.dt() + T))
        dom3.initialize_local_assembly()
        dom3.mesh_classical(itp_order=2, itg_order=5)
        dom3.assemble_global_variables()
        with pytest.raises(ValueError):
            load_checkpoint(dom3, ckpt)


class TestVTK:
    def test_write_quadratic_quad(self, tmp_path):
        dom, wp = _make_transient_domain()
        dom.dessemble_x()
        path = str(tmp_path / "out.vtk")
        write_vtk(path, dom.workpieces[wp].mesh,
                  dom.workpieces[wp].disc.element_type)
        txt = open(path).read()
        assert "UNSTRUCTURED_GRID" in txt
        assert "SCALARS T double" in txt
        mesh = dom.workpieces[wp].mesh
        assert f"POINTS {mesh.n_cp} double" in txt
        assert f"CELLS {mesh.n_el}" in txt


class TestObservability:
    def test_memory_report(self):
        dom, wp = _make_transient_domain()
        rep = memory_report(dom, unit="KB")
        assert rep["TOTAL (KB)"] > 0
        assert rep["wp0.geometry"] > 0
        assert rep["sparse.K(linear+total)"] > 0

    def test_phase_timer(self, capsys):
        times = {}
        with phase_timer("demo", results=times):
            pass
        assert "demo" in times
        assert "demo" in capsys.readouterr().out
