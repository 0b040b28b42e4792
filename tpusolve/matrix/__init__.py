from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.spmv import spmv
from tpusolve.matrix.vectors import (
    to_device_vector,
    from_device_vector,
    pad_vector,
    unpad_vector,
)

__all__ = [
    "ShardedMatrix",
    "spmv",
    "to_device_vector",
    "from_device_vector",
    "pad_vector",
    "unpad_vector",
]
