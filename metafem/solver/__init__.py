"""Solver stack: domain frontend, local/global assembly, time integration.

TPU-native redesign of the reference's src/solver/: runtime Julia-Expr
codegen becomes trace-time lowering into jitted functions; atomic scatters
become sort-once + segment_sum; the GPU hash-dict sparsity pass becomes
host-side sort/unique.
"""

from .domain import FEM_Domain  # noqa: F401
