"""Global numeric configuration.

The reference (MetaFEM.jl) pins FEM_Float = Float64 and FEM_Int = Int32
(src/misc/02_Global_Macros.jl:123-124).  On TPU, float64 is software-emulated,
so the working precision is configurable: float64 is the default for
correctness-sensitive host/test paths, while the TPU hot path can run float32
storage with float64 (or compensated) reductions inside the Krylov solvers.

x64 must be enabled before the first jnp array is created, hence the module
import side effect here (this module is imported first by metafem/__init__).
"""

from __future__ import annotations

import dataclasses
import os

import jax

if os.environ.get("METAFEM_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# TPU MXU defaults to bf16 inputs for f32 matmuls; FEM jacobians/gradients
# are differences of near-equal coordinates/field values and cancel
# catastrophically at bf16 (8-bit mantissa) — element-scale geometry
# simply vanishes.  Force true-f32 (3-pass) matmuls; hot kernels that can
# tolerate bf16 opt back in locally with centered operands.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


@dataclasses.dataclass
class Config:
    """Numeric configuration, one per process (mutable before problem setup)."""

    #: floating dtype for mesh tables / assembly / solvers
    float_dtype: object = jnp.float64
    #: integer dtype for ids (Int32 in the reference; element counts < 2^31)
    int_dtype: object = jnp.int32

    @property
    def np_float(self):
        return np.dtype(self.float_dtype)

    @property
    def np_int(self):
        return np.dtype(self.int_dtype)


#: process-wide default; examples/tests may override fields before meshing.
config = Config()


def set_float_dtype(dtype) -> None:
    config.float_dtype = dtype


def fdtype():
    return config.float_dtype


def idtype():
    return config.int_dtype
