"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference is single-process/single-GPU (SURVEY §2.8); this package is
the TPU-native scaling layer it lacks: element-axis data parallelism over
ICI with XLA-inserted collectives.
"""

from .dataparallel import (shard_domain_state, element_sharding,  # noqa: F401
                           replicated_sharding)
from .rowshard import (rowblock_sharding, constrain,  # noqa: F401
                       RowShardedOp)
