"""Shared honest-timing helper for the device benchmarks.

Differential data-dependent chain timing (PERFORMANCE.md methodology):
``y = fn(y, consts)`` chained k times under one jit, timed at two chain
lengths and differenced — immune to dispatch latency and transport
result caching, and valid for primitives where each iteration consumes
the previous output (SpMV, V-cycle, assembly).  NOT valid for full
Newton steps, where XLA hoists state-only work out of the chain
(bench.py times those directly).
"""
import functools
import time

import numpy as np


def chain_time(fn, x0, consts=(), n=20, reps=3):
    """Per-call seconds for ``y = fn(y, consts)``.

    ``consts`` MUST carry every large array the phase reads — a
    closed-over array is baked into the program as an HLO constant,
    which overflows the remote-compile transport (HTTP 413) at 1M-DOF
    sizes (PERFORMANCE.md round-3 failure #1)."""
    import jax

    def chain(x, c, k):
        for _ in range(k):
            x = fn(x, c)
        return x

    c_long = jax.jit(functools.partial(chain, k=n))
    c_short = jax.jit(functools.partial(chain, k=n // 2))

    def run(c, x):
        """Timed call with a HOST SCALAR READBACK: through the remote
        transport, block_until_ready alone does not reliably force
        completion (measured ~0 for multi-hundred-ms chains); pulling a
        scalar that data-depends on the result does.  The readback cost
        is identical for both chain lengths, so it cancels in the
        differential."""
        t0 = time.perf_counter()
        y = c(x, consts)
        leaf = jax.tree_util.tree_leaves(y)[0]
        float(leaf.reshape(-1)[0])
        return time.perf_counter() - t0

    run(c_long, x0)
    run(c_short, x0)
    best = np.inf
    for rep in range(reps):
        # fresh input per rep: the transport also caches
        # (program, input) -> result, so re-timing an identical call can
        # return in ~0 (measured: negative differential times)
        x_r = jax.tree_util.tree_map(
            lambda v: v * (1.0 + 1e-6 * (rep + 1)), x0)
        jax.block_until_ready(x_r)
        t_long = run(c_long, x_r)
        t_short = run(c_short, x_r)
        best = min(best, (t_long - t_short) / (n - n // 2))
    return best
