from qrag_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    distributed_init,
    make_mesh,
)
from qrag_tpu.parallel.sharded_index import ShardedFlatIndex

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "distributed_init",
    "make_mesh",
    "ShardedFlatIndex",
]
