"""Correctness at scale: solve the FEATool strip config at ~1.28M DOF in
f32 on the TPU via the fully-jitted step, and check the midline
temperatures against the FEATool samples (same BVP as examples/thermal_2d,
just a finer mesh)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
sys.path.insert(0, "examples")

from step_probe import build  # noqa: E402
import thermal_2d  # noqa: E402
from metafem.linsolve import krylov  # noqa: E402


def main():
    dom = build((800, 400))
    dom.converge_tol = 1e-3
    # host-driven Newton + pass loop: keeps each device dispatch bounded
    # (very long single programs can trip the worker watchdog)
    dom.linear_solver = dom.make_iterative_solver(
        sv_func=krylov.bicgstab, maxiter=1000, max_pass=14)
    t0 = time.time()
    for step in range(3):
        res = dom.update_one_step(max_iter=3)
        print(f"step {step}: residue = {res:.4e} "
              f"({time.time() - t0:.1f}s elapsed)", flush=True)
    dom.dessemble_x()
    mesh = dom.workpieces[0].mesh
    x, y = mesh.cp_coords[:, 0], mesh.cp_coords[:, 1]
    sel = np.abs(x - 0.01) < 1e-8
    ys, Ts = y[sel], mesh.fields["T"][sel]
    order = np.argsort(ys)
    Ti = np.interp(thermal_2d.FEATOOL_Y, ys[order], Ts[order])
    err = np.abs(Ti - thermal_2d.FEATOOL_T) / thermal_2d.FEATOOL_T
    print(f"1.28M-DOF f32 solve: max rel deviation vs FEATool = "
          f"{err.max():.5f}")


if __name__ == "__main__":
    main()
