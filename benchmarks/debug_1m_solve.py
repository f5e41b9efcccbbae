"""Stage the first Newton iteration at 1.28M DOF manually: check assembly
outputs, then watch the Krylov residual pass by pass."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from step_probe import build  # noqa: E402
from metafem.linsolve import krylov  # noqa: E402
from metafem.linsolve.block_offset import OffsetMatrix  # noqa: E402
from metafem.linsolve.precond import pr_jacobi  # noqa: E402


def main():
    dom = build((800, 400))
    state = dom._runtime_state()
    KL = dom._k_linear(state)
    state["K_linear"] = KL
    state["x_star"] = dom.x
    residue, K_total = dom._res_k(state)
    print("KL finite:", bool(jnp.isfinite(KL).all()),
          "K finite:", bool(jnp.isfinite(K_total).all()),
          "r finite:", bool(jnp.isfinite(residue).all()),
          "|r|/sqrt(n):", float(jnp.linalg.norm(residue))
          / np.sqrt(residue.size), flush=True)
    A = OffsetMatrix.from_values(K_total, dom.pattern.offset_layout)
    d = A.diag()
    print("diag: min|d|", float(jnp.abs(d).min()),
          "max|d|", float(jnp.abs(d).max()),
          "zeros:", int((d == 0).sum()), flush=True)
    A, unscale = pr_jacobi(A, None)
    ds = A.diag()
    print("scaled diag: min", float(ds.min()), "max", float(ds.max()),
          flush=True)
    b = residue
    for name, sv, kw in (("bicgstab", krylov.bicgstab, {}),
                         ("bicgstabl4", krylov.bicgstabl, {"s": 4}),
                         ("idrs8", krylov.idrs, {"s": 8}),
                         ("gmres40", krylov.gmres, {"s": 40})):
        x = jnp.zeros_like(b)
        t0 = time.time()
        for p in range(4):
            x, iters, rn = sv(A, b, x0=x, tol=1e-5, maxiter=500, **kw)
            rr = b - A.mv(x)
            tr = float(jnp.linalg.norm(rr)) / np.sqrt(b.size)
            print(f"{name} pass {p}: iters={int(iters)} "
                  f"true={tr:.3e} ({time.time()-t0:.1f}s)", flush=True)
            if not np.isfinite(tr) or tr > 1e3:
                break


if __name__ == "__main__":
    main()
