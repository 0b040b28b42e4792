"""Distributed SpMV: halo exchange + padded-ELL local kernel.

This is the hot kernel of the entire framework — the operation HYPRE
performs inside every Krylov iteration and AMG cycle (consumed by the
reference through ``HYPRE_ParCSRMatrix``; vendor-SpMV toggle ref:
src/main.cpp:137-145).

Design (TPU-first):

* ``shard_map`` over the matrix's 1-D mesh axis; each device sees its own
  (row_pad, K) ELL blocks;
* halo exchange = gather of the statically planned send entries followed by
  **one** ``lax.all_to_all`` over ICI (replacing HYPRE's MPI neighbor
  point-to-point machinery);
* local kernel = two gathers + fused multiply-reduce over the ELL width;
  XLA fuses this into a single pass over the matrix bytes.  A Pallas
  variant lives in tpusolve.kernels.ell_spmv (kernel-selection analog of
  the reference's ``spmv_use_vendor``, ref: src/main.cpp:137-145).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange(x_loc, send_idx, ghost_slot, axis):
    """Exchange ghost values over the mesh axis.

    x_loc:      (col_pad,)    local slice of the input vector
    send_idx:   (Pn, S) int32 local indices each peer needs from us
    ghost_slot: (G,) int32    position of each of our ghosts in the flat
                              receive buffer (owner * S + slot)
    Returns ghosts (G,).
    """
    sendbuf = x_loc[send_idx]                       # (Pn, S)
    recv = lax.all_to_all(sendbuf, axis, 0, 0)      # recv[q] = from device q
    return recv.reshape(-1)[ghost_slot]


def ell_spmv_local(diag_vals, diag_cols, offd_vals, offd_cols, x_loc, ghosts):
    """Per-device padded-ELL SpMV: y = A_diag x_loc + A_offd ghosts."""
    y = jnp.sum(diag_vals * x_loc[diag_cols], axis=-1)
    y = y + jnp.sum(offd_vals * ghosts[offd_cols], axis=-1)
    return y


def _spmv_shard(axis, dv, dc, ov, oc, sidx, gslot, x_loc):
    dv, dc, ov, oc, sidx, gslot = (a[0] for a in (dv, dc, ov, oc, sidx, gslot))
    ghosts = halo_exchange(x_loc, sidx, gslot, axis)
    return ell_spmv_local(dv, dc, ov, oc, x_loc, ghosts)


def spmv(A, x):
    """y = A @ x.

    ``x`` is a padded sharded vector over A's *column* decomposition
    (shape ``(nparts * col_pad,)``); returns a padded sharded vector over
    A's *row* decomposition (shape ``(nparts * row_pad,)``).
    """
    spec = P(A.axis)
    fn = shard_map(
        partial(_spmv_shard, A.axis),
        mesh=A.mesh,
        in_specs=(spec,) * 7,
        out_specs=spec,
    )
    return fn(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols,
              A.send_idx, A.ghost_slot, x)


def matvec_fn(A):
    """Closure y = A @ x suitable for passing to Krylov solvers."""
    return partial(spmv, A)
