"""Profiling hooks + memory ledger.

The reference's observability is @time wrappers and a recursive
report_memory byte counter (misc/02_Global_Macros.jl:140-172, SURVEY §5.1).
TPU-native equivalents: a phase timer that blocks on device completion
(honest async timing), a jax.profiler trace context for xprof/tensorboard,
and an HBM ledger that walks the runtime state pytree.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import numpy as np

_UNITS = {"B": 1.0, "KB": 2 ** 10, "MB": 2 ** 20, "GB": 2 ** 30}


@contextlib.contextmanager
def phase_timer(label: str, results: Dict[str, float] | None = None,
                verbose: bool = True):
    """Wall-time a phase, blocking on all outstanding device work at exit
    so async dispatch doesn't fake the number."""
    t0 = time.perf_counter()
    out: list = []
    yield out
    if out:  # caller may append arrays to block on
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = results.get(label, 0.0) + dt
    if verbose:
        print(f"[metafem] {label}: {dt * 1e3:.2f} ms")


@contextlib.contextmanager
def trace_profile(logdir: str):
    """jax.profiler trace for xprof/tensorboard inspection of the jitted
    assembly/solver kernels."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _nbytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
        elif isinstance(leaf, (int, float)):
            total += 8
    return total


def memory_report(domain, unit: str = "MB") -> Dict[str, float]:
    """Bytes of device state per subsystem (the HBM ledger; analog of the
    reference's report_memory at allocation sites)."""
    div = _UNITS[unit]
    rep: Dict[str, float] = {}
    if domain.state is not None:
        for i, wps in enumerate(domain.state["wp"]):
            rep[f"wp{i}.geometry"] = (_nbytes(wps["el"])
                                      + _nbytes(wps["bdy"])) / div
            rep[f"wp{i}.fields"] = _nbytes(wps["fields"]) / div
    if domain.x is not None:
        rep["globalfield.x/dx"] = (_nbytes(domain.x)
                                   + _nbytes(domain.dx)) / div
    if domain.pattern is not None:
        p = domain.pattern
        # two K buffers (linear + total) + CSR index arrays
        itemsize = np.dtype(np.float64).itemsize \
            if str(domain.dtype) == "float64" else 4
        rep["sparse.K(linear+total)"] = 2 * p.nnz * itemsize / div
        rep["sparse.indices"] = (p.csr_perm.nbytes + p.rows_sorted.nbytes
                                 + p.cols_sorted.nbytes) / div
    rep["user_state"] = _nbytes(domain.user_state) / div
    rep[f"TOTAL ({unit})"] = sum(v for k, v in rep.items()
                                 if not k.startswith("TOTAL"))
    return rep
