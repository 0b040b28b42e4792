"""tpusolve — a TPU-native distributed sparse linear solver framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of the
Exawind/hypre-mini-app benchmark driver (reference: /root/reference), which
delegates its numerics to LLNL HYPRE.  Here the full solve path — sharded
ParCSR-analog sparse matrices, halo exchange over ICI, Krylov solvers
(PCG/GMRES/COGMRES/FlexGMRES/BiCGSTAB), BoomerAMG-style algebraic multigrid,
and ILU smoothing — is implemented natively for TPU:

* compute path: jitted JAX + Pallas kernels over padded-ELL tiles,
* distribution: ``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives
  (``psum`` for dot products, ``all_to_all`` for halo exchange) in place of
  the reference's MPI (ref: src/main.cpp:33-35),
* harness: the same YAML schema, 8-step lifecycle and named phase timers as
  the reference driver (ref: src/main.cpp:164-216).
"""

__version__ = "0.1.0"

from tpusolve.mesh import make_mesh, row_decomposition
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.vectors import to_device_vector, from_device_vector
from tpusolve.matrix.spmv import spmv

__all__ = [
    "make_mesh",
    "row_decomposition",
    "ShardedMatrix",
    "spmv",
    "to_device_vector",
    "from_device_vector",
]
