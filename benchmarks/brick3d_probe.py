"""3D structured thermal at ~1M DOF on TPU: validates the lattice fast
paths, block-offset storage, and geometric multigrid in 3D (the 2D
numbers are in PERFORMANCE.md; the lattice machinery is dim-generic but
3D has 5x more offsets and a much larger halo radius).
"""

import sys
import time

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
    bottom = mf.select_facets(geo, lambda c: c[:, 2] < eps)
    top = mf.select_facets(geo, lambda c: c[:, 2] > L - eps)
    bg_b = dom.add_boundary(wp, bottom)
    bg_t = dom.add_boundary(wp, top)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg_b, 1000.0 * Bilinear(T, 800.0 - T))
    dom.assign_boundary_weakform(wp, bg_t, 50.0 * Bilinear(T, 300.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    t0 = time.perf_counter()
    dom.mesh_classical(itp_order=2, itg_order=3, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    print(f"host setup: {time.perf_counter()-t0:.1f}s", flush=True)
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.set_field(wp, "s", np.full(mesh.n_cp, 100.0))
    dom.refresh_fields()
    dom.assemble_x()
    dom.converge_tol = 5e-4

    lo = dom.pattern.offset_layout
    nnz = lo.storage_of_slot.size
    in_dense = int((lo.storage_of_slot < lo.n_dense).sum())
    fm = dom._fast_maps
    print("n dof:", dom.pattern.basicfield_size,
          "lattice:", mesh.lattice_shape, flush=True)
    print(f"segments: {len(lo.segments)} dense nnz frac: "
          f"{in_dense/nnz:.3f} coo tail: {lo.n_coo}", flush=True)
    print("fast streams:", {pk: {k: len(v) for k, v in ph.items()}
                            for pk, ph in fm.items()
                            if pk in ("lin", "nl")},
          "gather fast:", list(fm.get("gather", {}).keys()), flush=True)

    step = dom.make_jitted_step(sv_func=krylov.bicgstab, maxiter=40,
                                max_newton=3, max_pass=1, precond="mg")
    state = dom._runtime_state()
    x_new, dx, res, it = step(state, dom.x, jnp.float32(0.0),
                              jnp.float32(1.0))
    jax.block_until_ready(x_new)
    print(f"warm: res={float(res):.2e} newton={int(it)}", flush=True)
    for t in range(3):
        x1 = dom.x * np.float32(1.0 + 1e-4 * (t + 1))
        jax.block_until_ready(x1)
        t0 = time.perf_counter()
        _, _, res, it = step(state, x1, jnp.float32(0.0), jnp.float32(1.0))
        r = float(res)
        print(f"3D newton step: {(time.perf_counter()-t0)*1e3:.0f} ms "
              f"res={r:.2e} newton={int(it)}", flush=True)


if __name__ == "__main__":
    main()
