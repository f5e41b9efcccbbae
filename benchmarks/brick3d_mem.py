"""Compile-only memory analysis of the 3D MG step at 1.44M DOF."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    from metafem.linsolve import krylov

    nel = (56, 56, 56)
    L = 1.0
    vert, conn = mf.make_brick((L, L, L), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    bot = mf.select_facets(geo, lambda c: c[:, 2] < eps)
    top = mf.select_facets(geo, lambda c: c[:, 2] > L - eps)
    dom.add_boundary(wp, bot)
    dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, 0, 1000.0 * Bilinear(T, 800.0 - T))
    dom.assign_boundary_weakform(wp, 1, 50.0 * Bilinear(T, 300.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=3, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.set_field(wp, "s", np.full(mesh.n_cp, 100.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 5e-4
    print("setup done", flush=True)

    step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=40,
                                max_newton=3, max_pass=1, precond="mg")
    state = dom._runtime_state()
    lowered = step.lower(state, dom.x, jnp.float32(0.0), jnp.float32(1.0))
    print("lowered", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("memory analysis:", ma, flush=True)


if __name__ == "__main__":
    main()
