"""metafem: a TPU-native generic FEM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference MetaFEM.jl (jxx2/MetaFEM.jl): PDE weak forms written as
tensor-index meta-expressions are symbolically differentiated and lowered at
trace time into batched, jit-compiled element kernels; sparse systems are
assembled scatter-free via sort-once + segment_sum and solved by
preconditioned matrix-free Krylov methods inside a generalized-alpha /
Newton time loop.
"""

from . import config  # noqa: F401  (enables x64 before any jnp arrays)
from .config import set_float_dtype, fdtype, idtype
from .symbolics import (Bilinear, Expr, SymRef, index, indices, fn, log,
                        ifelse, d, visualize, register_rule,
                        unregister_rule, registered_rules,
                        register_diff_rule)
from .solver import FEM_Domain
from .mesh.builders import (make_square, make_brick, refine_simplex,
                            select_facets)
from .mesh.ref_geometry import construct_total_mesh, get_boundary_mesh
from .mesh.readers import read_mesh

__version__ = "0.1.0"
