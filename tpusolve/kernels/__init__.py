"""TPU kernels: BDIA (blocked-DIA, Pallas) and BELL (block-ELL) SpMV.

The measurement study that justifies every layout/kernel decision in this
package (and in matrix/sharded.py's assembly-time selection) lives in
docs/KERNEL_STUDY.md.
"""

from tpusolve.kernels import bdia, bell  # noqa: F401
