"""Probe: run the fully-jitted Newton step directly on TPU at increasing
sizes to find where the worker crashes."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def build(nel):
    import metafem as mf
    from metafem import Bilinear
    from metafem.solver.domain import FEM_Domain
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    top = mf.select_facets(geo, lambda c: c[:, 1] > L2 - eps)
    bf, bt = dom.add_boundary(wp, ends), dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    n = dom.sym("n")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(
        wp, bf, 1000.0 * Bilinear(T, 1173.15 - T)
        + 3.0 * Bilinear(T, n[i] * T.d(i)))
    dom.assign_boundary_weakform(
        wp, bt, 50.0 * Bilinear(T, 323.15 - T)
        + 0.7 * 5.669e-8 * Bilinear(T, 323.15 ** 4 - T ** 4))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 400.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 5e-4
    return dom


def main():
    from metafem.linsolve import krylov
    for nel in ((100, 50), (400, 200), (800, 400)):
        t0 = time.time()
        dom = build(nel)
        print(f"nel={nel}: built ({time.time() - t0:.1f}s), "
              f"bfs={dom.pattern.basicfield_size}, "
              f"segments={len(dom.pattern.offset_layout.segments)}, "
              f"coo_tail={dom.pattern.offset_layout.n_coo}", flush=True)
        t0 = time.time()
        res = dom.update_one_step_jit(max_iter=3, sv_func=krylov.bicgstab,
                                      maxiter=200)
        print(f"  step1 res={res:.3e} ({time.time() - t0:.1f}s incl "
              f"compile)", flush=True)
        t0 = time.time()
        res = dom.update_one_step_jit(max_iter=3)
        print(f"  step2 res={res:.3e} ({time.time() - t0:.2f}s)",
              flush=True)


if __name__ == "__main__":
    main()
