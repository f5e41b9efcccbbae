"""Linear solvers: matrix-free Krylov methods + preconditioners + direct
fallback.

The TPU-native analog of the reference's src/solver/linear_solver/: the
CUSPARSE CSR SpMV becomes gather + segment_sum (deterministic); the
hand-rolled Krylov iterations become ``lax.while_loop`` bodies jitted once;
cuSOLVER direct solves become a scipy splu host fallback.
"""

from .spmv import SparseMatrix  # noqa: F401
from .driver import iterative_solve, solver_lu, solver_qr  # noqa: F401
from .krylov import (bicgstab, bicgstabl, cg, cgs, cgs2, gmres, idrs,  # noqa: F401
                     idrs_original, lsqr, tfqmr)
