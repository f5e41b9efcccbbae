"""Localize the 3D step's memory: compile pieces separately and print
each piece's code/temp sizes."""

import sys

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
    dom.time_discretization.update_time(1.0, dom.pattern.max_time_level)
    state = dom._runtime_state()
    state["x_star"] = dom.x
    print("setup done", flush=True)

    def report(label, lowered):
        c = lowered.compile()
        ma = c.memory_analysis()
        print(f"{label}: code={ma.generated_code_size_in_bytes/1e9:.2f}G "
              f"args={ma.argument_size_in_bytes/1e9:.2f}G "
              f"temp={ma.temp_size_in_bytes/1e9:.2f}G", flush=True)

    res_k = dom._res_k.__wrapped__
    k_linear = dom._k_linear.__wrapped__
    report("k_linear", jax.jit(k_linear).lower(state))
    report("res_k", jax.jit(res_k).lower(state))

    K = jnp.zeros(dom.pattern.n_storage, jnp.float32)
    A = OffsetMatrix.from_values(K, dom.pattern.offset_layout)
    hier = multigrid.hierarchy_for_domain(dom)
    mask = multigrid.mask_for_domain(dom)
    report("mg_setup", jax.jit(
        lambda A, m: multigrid.mg_setup(hier, A, m)).lower(A, mask))

    mg_state = jax.eval_shape(
        lambda A, m: multigrid.mg_setup(hier, A, m), A, mask)
    # build a concrete mg_state cheaply via zeros_like of the shapes
    mg_zeros = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), mg_state)
    b = jnp.zeros(dom.pattern.basicfield_size, jnp.float32)
    report("vcycle", jax.jit(
        lambda st, b: multigrid.vcycle(hier, st, b)).lower(mg_zeros, b))

    def solve(A, st, b):
        op = multigrid.MGOperator(A, st, hier)
        y, it, r = krylov.bicgstab(op, b, tol=1e-5, maxiter=40)
        return op.apply_m(y)
    report("bicgstab(MG,40)", jax.jit(solve).lower(A, mg_zeros, b))


if __name__ == "__main__":
    main()
