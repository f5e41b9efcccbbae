"""Probe: how fast are random VMEM gathers inside a Pallas TPU kernel?

This decides the assembly/SpMV kernel design: HBM random access measures
~150M rows/s (latency-bound), so the only way to beat it is block-local
random access against VMEM-resident windows.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def vmem_gather_kernel(x_ref, idx_ref, out_ref):
    # x window and indices are VMEM-resident; gather within VMEM
    out_ref[:] = x_ref[idx_ref[:]]


def make_fn(n_win, n_idx):
    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            vmem_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx,), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    return f


def chain(f, x, idx, N=20):
    @jax.jit
    def run(c):
        def body(i, c):
            out = f(x * (1 + c), idx)
            return 1e-30 * out.mean()
        return jax.lax.fori_loop(0, N, body, c)
    out = run(0.0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(run(0.0))
    return 1e3 * (time.perf_counter() - t0) / N


def main():
    rng = np.random.default_rng(0)
    for n_win, n_idx in ((16384, 131072), (65536, 524288)):
        x = jnp.asarray(rng.random(n_win, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, n_win, n_idx).astype(np.int32))
        f = make_fn(n_win, n_idx)
        try:
            ms = chain(f, x, idx)
            rate = n_idx / (ms * 1e-3) / 1e6
            print(f"VMEM gather {n_idx} from {n_win}: {ms:.3f} ms "
                  f"({rate:.0f} M/s)")
        except Exception as e:
            print(f"VMEM gather {n_idx} from {n_win}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
