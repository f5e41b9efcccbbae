"""Coupled transient thermo-elasticity — a cantilever heated on one side
bends away from the heat (the reference's multi-field coupling example,
examples/thermal_elasticity/themal_hypo_elasticity.jl): temperature
diffusion (1st-order in time) + thermal-strain elasticity with viscous
relaxation, stepped to steady state (|u̇| < 1e-4, |Ṫ| < 1e-2,
themal_hypo_elasticity.jl:120-130)."""

import numpy as np

import metafem as mf
from metafem import Bilinear
from metafem.linsolve import krylov
from metafem.solver.domain import FEM_Domain


def build(e_number=4, LW_ratio=10):
    L_box = 1.0
    size = (L_box * LW_ratio, L_box, L_box)
    nel = (int(e_number * LW_ratio / 4), e_number, e_number)
    vert, conn = mf.make_brick(size, nel)
    geo = mf.construct_total_mesh(vert, conn)

    E, nu = 210e3, 0.0
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    tau_b = 1000 * E / L_box
    rho, c_visc = 1e3, 0.01
    h, C_heat, k, alpha = 100.0, 1000.0, 100.0, 0.05e-3

    dom = FEM_Domain(3)
    wp = dom.add_workpiece(geo)
    eps_g = L_box / e_number * 0.01
    left = mf.select_facets(geo, lambda cc: cc[:, 0] < eps_g)
    others = mf.select_facets(geo, lambda cc: cc[:, 0] >= eps_g)
    bg_fix = dom.add_boundary(wp, left)
    bg_conv = dom.add_boundary(wp, others)

    d_ = dom.internal_var("d")
    T = dom.internal_var("T")
    Te = dom.external_var("Te", "CONTROLPOINT_VAR")
    delta = dom.sym("delta")
    i, j, m = mf.indices("i j m")

    eps = dom.define("eps", [i, j], (d_[i].d(j) + d_[j].d(i)) / 2.0
                     - alpha * T * delta[i, j])
    sig = dom.define("sig", [i, j],
                     lam * delta[i, j] * eps[m, m] + 2.0 * mu * eps[i, j])

    heat = C_heat * Bilinear(T, T.dt()) + k * Bilinear(T.d(i), T.d(i))
    elast = (Bilinear(eps[i, j], sig[i, j])
             + Bilinear(d_[i], rho * c_visc * d_[i].dt()))
    dom.assign_workpiece_weakform(wp, heat + elast)
    dom.assign_boundary_weakform(wp, bg_fix,
                                 tau_b * Bilinear(d_[i], d_[i]))
    dom.assign_boundary_weakform(wp, bg_conv, h * Bilinear(T, T - Te))

    dom.initialize_local_assembly()
    dom.mesh_classical(itp_order=2, itg_order=5, itp_type="Serendipity")
    dom.assemble_global_variables()
    dom.compile()
    dom.converge_tol = 1e-6
    dom.linear_solver = dom.make_iterative_solver(
        sv_func=krylov.bicgstabl, maxiter=2000, max_pass=20, s=4)
    return dom, wp


def run_to_steady(dom, wp, Te_hot=300.0, max_steps=120, verbose=False):
    mesh = dom.workpieces[wp].mesh
    # heat only the front (y = 0) face; rest stays at Te = 0
    front = np.abs(mesh.cp_coords[:, 1]) < 1e-9
    Te = np.zeros(mesh.n_cp)
    Te[front] = Te_hot
    dom.set_field(wp, "Te", Te)
    dom.refresh_fields()
    dom.assemble_x()
    dom.dt = 1.0
    for step in range(1, max_steps + 1):
        dom.update_one_step(max_iter=3)
        dom.dessemble_x()
        umax = np.abs(mesh.fields["d2_t"]).max()
        Ttmax = np.abs(mesh.fields["T_t"]).max()
        if verbose and step % 10 == 0:
            print(f"step {step}: |d2_t| = {umax:.2e} |T_t| = {Ttmax:.2e} "
                  f"Tmax = {mesh.fields['T'].max():.2f} "
                  f"d2max = {np.abs(mesh.fields['d2']).max():.4f}")
        if umax < 1e-4 and Ttmax < 1e-2:
            break
    return step


if __name__ == "__main__":
    dom, wp = build(e_number=4)
    steps = run_to_steady(dom, wp, verbose=True)
    mesh = dom.workpieces[wp].mesh
    tip = mesh.cp_coords[:, 0] > np.nanmax(mesh.cp_coords[:, 0]) - 1e-9
    print(f"steady after {steps} steps; tip d2 mean = "
          f"{mesh.fields['d2'][tip].mean():.4f}, "
          f"T range = [{mesh.fields['T'].min():.1f}, "
          f"{mesh.fields['T'].max():.1f}]")
