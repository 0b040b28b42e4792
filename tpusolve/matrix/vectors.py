"""Sharded vector layout and host<->device staging.

Vectors are stored as flat padded arrays of shape ``(nparts * pad,)`` with
``NamedSharding(mesh, P(axis))``: shard ``p`` holds global entries
``[offsets[p], offsets[p+1])`` in its first ``count_p`` slots, with zeros in
the padded tail.  Every kernel in the framework preserves "padding is exactly
zero", so global reductions (dot products, norms) need no masks.

This is the analog of ``HYPRE_IJVector`` staging (ref:
src/HypreSystem.cpp:546-598 init, :957-1015 set-values) with
``jax.device_put`` replacing ``hypre_TAlloc/TMemcpy`` (ref: :793-810).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpusolve.mesh import ROWS_AXIS


def pad_vector(x: np.ndarray, offsets, pad: int) -> np.ndarray:
    """Host layout transform: global (n,) -> padded (nparts*pad,)."""
    offsets = np.asarray(offsets)
    nparts = len(offsets) - 1
    out = np.zeros((nparts, pad) + x.shape[1:], x.dtype)
    for p in range(nparts):
        lo, hi = offsets[p], offsets[p + 1]
        out[p, : hi - lo] = x[lo:hi]
    return out.reshape((nparts * pad,) + x.shape[1:])


def unpad_vector(xp: np.ndarray, offsets, pad: int) -> np.ndarray:
    """Inverse of :func:`pad_vector`."""
    offsets = np.asarray(offsets)
    nparts = len(offsets) - 1
    xp = np.asarray(xp).reshape((nparts, pad) + np.asarray(xp).shape[1:])
    out = np.zeros((int(offsets[-1]),) + xp.shape[2:], xp.dtype)
    for p in range(nparts):
        lo, hi = offsets[p], offsets[p + 1]
        out[lo:hi] = xp[p, : hi - lo]
    return out


def to_device_vector(mesh, x: np.ndarray, offsets, pad: int, dtype=None,
                     axis: str = ROWS_AXIS) -> jax.Array:
    """Place a global host vector on the mesh in padded sharded layout."""
    xp = pad_vector(np.asarray(x), offsets, pad)
    if dtype is not None:
        xp = xp.astype(dtype)
    from tpusolve.mesh import put_sharded
    return put_sharded(xp, mesh, P(axis))


def from_device_vector(x: jax.Array, offsets, pad: int) -> np.ndarray:
    """Fetch a padded sharded vector back to a host global vector.

    Multi-process: the array spans non-addressable devices, so the local
    shards are allgathered first (every host gets the full global vector —
    the reference's checks/writers are likewise rank-replicated gathers,
    src/HypreSystem.cpp:771-845)."""
    from tpusolve.mesh import fetch_host
    return unpad_vector(fetch_host(x), offsets, pad)


def zeros_like_rows(A, dtype=None, axis: str | None = None) -> jax.Array:
    """Zero vector in the row space of a ShardedMatrix, sharded on its mesh."""
    axis = axis or A.axis
    sharding = NamedSharding(A.mesh, P(axis))
    return jax.device_put(
        np.zeros(A.padded_nrows, dtype or A.dtype), sharding)


def replicated(mesh, x, dtype=None) -> jax.Array:
    """Place a small array fully replicated on the mesh."""
    x = np.asarray(x, dtype)
    return jax.device_put(x, NamedSharding(mesh, P()))
