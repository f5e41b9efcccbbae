"""Decompose the MG Newton-step cost at 1M DOF with honest timing
(data-dependent chains + scalar readbacks + perturbed inputs).

Phases timed separately: tangent assembly, mg_setup, one V-cycle
(chained), and the MG-preconditioned bicgstab solve.
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
    from metafem.linsolve import krylov, multigrid
    from metafem.linsolve.block_offset import OffsetMatrix

    nel = (800, 400)
    L1, L2 = 0.02, 0.01
    vert, conn = mf.make_square((L1, L2), nel)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(2, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    eps = 1e-9
    ends = mf.select_facets(geo, lambda c: (c[:, 0] < eps)
                            | (c[:, 0] > L1 - eps))
    bg = dom.add_boundary(wp, ends)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -3.0 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.assign_boundary_weakform(wp, bg, 1000.0 * Bilinear(T, 1173.0 - T))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    mesh = dom.workpieces[wp].mesh
    dom.set_field(wp, "T", np.full(mesh.n_cp, 300.0))
    dom.refresh_fields()
    dom.assemble_x()
    print("n dof:", dom.pattern.basicfield_size, flush=True)

    dom.time_discretization.update_time(dom.dt, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["K_linear"] = dom._k_linear(state)
    res_k = dom._res_k.__wrapped__
    layout = dom.pattern.offset_layout
    hier = multigrid.hierarchy_for_domain(dom)
    mask = multigrid.mask_for_domain(dom)

    def timed_chain(f, args, n1, n2, label):
        c1 = jax.jit(lambda *a: f(n1, *a))
        c2 = jax.jit(lambda *a: f(n2, *a))
        float(c1(*args)); float(c2(*args))
        out = []
        for t in range(3):
            pert = tuple(a * np.float32(1.0 + 1e-5 * (t + 1))
                         if hasattr(a, "dtype") else a for a in args)
            t0 = time.perf_counter(); float(c1(*pert))
            t1 = time.perf_counter(); float(c2(*pert))
            t2 = time.perf_counter()
            out.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        ms = 1e3 * np.median(out)
        print(f"{label}: {ms:.2f} ms", flush=True)
        return ms

    # (a) assembly chain: each iteration re-assembles from perturbed x
    # (state/mg_state/A passed as jit ARGS — as closure constants they
    # blow the remote-transport program-size limit)
    def asm_chain(n, state, x):
        def body(k, carry):
            x, acc = carry
            st = dict(state); st["x_star"] = x
            residue, K_total = res_k(st)
            return x * (1.0 + 1e-7 * residue[0]), acc + K_total[0]
        x, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc + x.reshape(-1)[0]
    timed_chain(asm_chain, (state, dom.x), 1, 5, "assembly (res+K)")

    # reference tangent for the solver phases
    st0 = dict(state); st0["x_star"] = dom.x
    residue, K_total = dom._res_k(st0)
    A = OffsetMatrix.from_values(K_total, layout)
    mg_state = jax.jit(lambda A: multigrid.mg_setup(hier, A, mask))(A)
    jax.block_until_ready(mg_state)

    # (b) mg_setup chain: perturb vals per iteration (data dependence)
    def setup_chain(n, vals):
        def body(k, carry):
            vals, acc = carry
            Ai = OffsetMatrix.from_values(vals, layout)
            sti = multigrid.mg_setup(hier, Ai, mask)
            z = sti[-1]["inv"][0, 0]
            return vals * (1.0 + 1e-9 * z), acc + z
        vals, acc = jax.lax.fori_loop(0, n, body, (vals, jnp.float32(0.0)))
        return acc
    timed_chain(setup_chain, (A.vals,), 1, 3, "mg_setup")

    # (c) V-cycle chain
    def vc_chain(n, mg_state, b):
        def body(k, v):
            v = multigrid.vcycle(hier, mg_state, v)
            return v / jnp.linalg.norm(v)
        v = jax.lax.fori_loop(0, n, body, b)
        return v[0]
    timed_chain(vc_chain, (mg_state, residue), 2, 22, "vcycle")

    # (d) plain A.mv chain for scale
    def mv_chain(n, A, b):
        def body(k, v):
            v = A.mv(v)
            return v / jnp.linalg.norm(v)
        v = jax.lax.fori_loop(0, n, body, b)
        return v[0]
    timed_chain(mv_chain, (A, residue), 2, 22, "A.mv")

    # (e) one full preconditioned solve (fixed 15 iters)
    op = multigrid.MGOperator(A, mg_state, hier)
    def solve_chain(n, op, b):
        def body(k, b):
            y, it, r = krylov.bicgstab(op, b, tol=1e-30, maxiter=15)
            x = op.apply_m(y)
            return b + 1e-6 * x
        b = jax.lax.fori_loop(0, n, body, b)
        return b[0]
    timed_chain(solve_chain, (op, residue), 1, 3, "bicgstab(MG) 15 iters")


if __name__ == "__main__":
    main()
