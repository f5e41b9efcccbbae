"""Honest TPU microbench: fused Pallas block-offset SpMV vs the XLA
shifted-add path, on the 1M-DOF thermal tangent (f32).

Timing method (see PERFORMANCE.md): data-dependent chains of mv
applications ended by a scalar readback, differential over two chain
lengths, perturbed inputs per run.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build(nel=(800, 400)):
    import jax.numpy as jnp
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
    bg_fix = dom.add_boundary(wp, ends)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg_fix, 1000.0 * Bilinear(T, -T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    dom.assemble_x()
    return dom


def main():
    import jax
    import jax.numpy as jnp
    from metafem.linsolve import pallas_spmv
    from metafem.linsolve.block_offset import OffsetMatrix

    dom = build()
    print("n dof:", dom.pattern.basicfield_size, flush=True)
    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    jax.block_until_ready(A.vals)
    g = A.layout.pallas_groups[0]
    print(f"segments: {len(A.layout.segments)}  n_off={g.n_off} "
          f"coo tail: {A.layout.n_coo}", flush=True)

    def make_chain(n_iters, force):
        def chain(A, x):
            pallas_spmv.FORCE = force
            def body(i, v):
                v = A.mv(v)
                return v / jnp.linalg.norm(v)
            v = jax.lax.fori_loop(0, n_iters, body, x)
            pallas_spmv.FORCE = None
            return v[0] + v[1]
        return jax.jit(chain)

    rng = np.random.default_rng(0)
    for force, label in [(False, "xla "), (True, "pallas")]:
        c1 = make_chain(8, force)
        c2 = make_chain(40, force)
        x = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
        float(c1(A, x)); float(c2(A, x))        # compile+warm
        times = []
        for t in range(3):
            x = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
            jax.block_until_ready(x)
            t0 = time.perf_counter(); float(c1(A, x))
            t1 = time.perf_counter(); float(c2(A, x))
            t2 = time.perf_counter()
            times.append(((t2 - t1) - (t1 - t0)) / 32)
        ms = 1e3 * np.median(times)
        gbs = (A.layout.n_dense + 2 * A.n) * 4 / (ms * 1e-3) / 1e9
        print(f"{label}: {ms:.3f} ms/mv  ({gbs:.0f} GB/s effective)",
              flush=True)


if __name__ == "__main__":
    main()
