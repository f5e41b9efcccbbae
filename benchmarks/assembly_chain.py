"""Honest TPU assembly timing: data-dependent chain with K kept live.

Run with: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/assembly_chain.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import metafem as mf
from metafem import Bilinear
from metafem.solver.domain import FEM_Domain


def build(nel=(800, 400), dtype=jnp.float32):
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2, dtype=dtype)
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
    return dom


def make_chain(dom, state, N, fb):
    @jax.jit
    def chained(state):
        def body(i, carry):
            xs, acc = carry
            st = dict(state)
            st["x_star"] = xs
            r, K = dom._res_k.__wrapped__(st)
            # keep BOTH outputs live: feedback through r, accumulate K
            return (xs + fb * r[None, :], acc + K.sum() + r.sum())
        return jax.lax.fori_loop(0, N, body, (state["x_star"],
                                              jnp.float32(0.0)))
    return chained


def main():
    dom = build()
    state = dom._runtime_state()
    print("bfs", dom.pattern.basicfield_size, "nnz", dom.pattern.nnz)
    for N in (5, 20, 80):
        f = make_chain(dom, state, N, np.float32(1e-6))
        out = f(state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(state)
        jax.block_until_ready(out)
        tt = time.perf_counter() - t0
        xs, acc = out
        drift = float(jnp.abs(xs - state["x_star"]).max())
        print(f"N={N}: total {1e3 * tt:.1f} ms, per-iter "
              f"{1e3 * tt / N:.3f} ms, acc={float(acc):.6g}, "
              f"drift={drift:.3g}")


if __name__ == "__main__":
    main()
