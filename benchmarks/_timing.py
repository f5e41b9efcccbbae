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
    jax.block_until_ready(c_long(x0, consts))
    jax.block_until_ready(c_short(x0, consts))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(c_long(x0, consts))
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(c_short(x0, consts))
        t_short = time.perf_counter() - t0
        best = min(best, (t_long - t_short) / (n - n // 2))
    return best
