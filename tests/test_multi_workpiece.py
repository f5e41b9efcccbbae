"""Multiple workpieces in one domain: a monolithic system with disjoint
DOF blocks (the reference solves all workpieces in one coupled Kx=d,
solver/03_GlobalAssembly.jl:9-31)."""

import numpy as np

import metafem as mf
from metafem import Bilinear
from metafem.solver.domain import FEM_Domain


class TestMultiWorkpiece:
    def test_two_thermal_blocks(self):
        dom = FEM_Domain(2)
        T = dom.internal_var("T")
        s = dom.external_var("s", "CONTROLPOINT_VAR")
        i = mf.index("i")

        wps = []
        for nel, k in (((4, 4), 1.0), ((6, 3), 5.0)):
            vert, conn = mf.make_square((1.0, 1.0), nel)
            geo = mf.construct_total_mesh(vert, conn)
            wp = dom.add_workpiece(geo)
            bg = dom.add_boundary(wp, geo.boundary_facet_ids())
            dom.assign_workpiece_weakform(
                wp, -k * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
            dom.assign_boundary_weakform(
                wp, bg, 100.0 * Bilinear(T, 1.0 - T))
            wps.append(wp)

        dom.initialize_local_assembly()
        dom.mesh_classical(itp_order=1, itg_order=3)
        dom.assemble_global_variables()
        dom.compile()
        dom.converge_tol = 1e-10
        dom.linear_solver = dom.make_direct_solver()

        for wp in wps:
            mesh = dom.workpieces[wp].mesh
            dom.set_field(wp, "s", np.full(mesh.n_cp, 10.0))
        dom.refresh_fields()
        dom.assemble_x()
        res = dom.update_one_step(max_iter=3)
        assert res < 1e-10
        dom.dessemble_x()

        # DOF blocks are disjoint and both workpieces solved
        infos = dom.pattern.wp_infos
        assert infos[1].dof_offset == infos[0].n_cp
        T0 = dom.workpieces[0].mesh.fields["T"]
        T1 = dom.workpieces[1].mesh.fields["T"]
        assert T0.max() > 1.0 and T1.max() > 1.0
        # same physics, conductivity 5x -> smaller temperature rise
        assert T1.max() < T0.max()
        # each block solves its own Poisson problem: compare block 0
        # against a single-workpiece solve of the same config
        dom_ref = FEM_Domain(2)
        Tr = dom_ref.internal_var("T")
        sr = dom_ref.external_var("s", "CONTROLPOINT_VAR")
        vert, conn = mf.make_square((1.0, 1.0), (4, 4))
        geo = mf.construct_total_mesh(vert, conn)
        wpr = dom_ref.add_workpiece(geo)
        bgr = dom_ref.add_boundary(wpr, geo.boundary_facet_ids())
        dom_ref.assign_workpiece_weakform(
            wpr, -1.0 * Bilinear(Tr.d(i), Tr.d(i)) + Bilinear(Tr, sr))
        dom_ref.assign_boundary_weakform(
            wpr, bgr, 100.0 * Bilinear(Tr, 1.0 - Tr))
        dom_ref.initialize_local_assembly()
        dom_ref.mesh_classical(itp_order=1, itg_order=3)
        dom_ref.assemble_global_variables()
        dom_ref.compile()
        dom_ref.converge_tol = 1e-10
        dom_ref.linear_solver = dom_ref.make_direct_solver()
        dom_ref.set_field(wpr, "s",
                          np.full(dom_ref.workpieces[0].mesh.n_cp, 10.0))
        dom_ref.refresh_fields()
        dom_ref.assemble_x()
        dom_ref.update_one_step(max_iter=3)
        dom_ref.dessemble_x()
        np.testing.assert_allclose(
            T0, dom_ref.workpieces[0].mesh.fields["T"], rtol=1e-9)
