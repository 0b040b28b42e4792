"""Layout materialization: compact COO-style staging -> padded device arrays.

The padded layouts this framework's kernels consume (ELL / DIA / block-ELL
tiles) are *much* larger than the nnz-compact data they're built from — a
7M-nnz unstructured diag block can expand to a multi-GB tile array.  Building
those on the host and shipping them over is wrong twice on TPU systems:

* host first-touch page faults dominate (a GB-scale ``np.zeros`` that is then
  sparsely written costs minutes on paravirtual hosts — measured ~45 us/4KB
  page on the build VM), and
* the host->device link then streams the *expanded* bytes instead of the
  compact ones.

So, like the reference's on-GPU assembly path (device CSR staging +
``HYPRE_IJMatrixSetValues2`` on device pointers, ref:
src/HypreSystem.cpp:1540-1597), large layouts are materialized **on device**:
the host prepares compact ``(flat_index, value)`` staging arrays, uploads
those (sharded), and one jitted ``shard_map`` scatter writes the padded
layout directly into HBM.  Small layouts keep the host fill — not worth a
kernel compilation.

Staging shapes are bucketed to powers of two (index ``-1`` + ``mode="drop"``
padding) so repeated builds (AMG hierarchy levels) reuse compiled scatter
kernels whenever their output shapes coincide.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Outputs at least this large are scatter-built on device; smaller ones are
# filled on host (a device build costs one XLA compilation per new shape).
DEVICE_BUILD_MIN_BYTES = 64 << 20


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(x) - 1).bit_length()


_builder_cache: dict = {}


def _scatter_builder(mesh, axis, shape_tail, dtype, nnz_pad):
    key = (id(mesh), axis, tuple(shape_tail), np.dtype(dtype).str, nnz_pad)
    fn = _builder_cache.get(key)
    if fn is not None:
        return fn
    per_size = int(np.prod(shape_tail))

    def shard_fn(idx, vals):
        flat = jnp.zeros((per_size,), dtype)
        flat = flat.at[idx[0]].set(vals[0], mode="drop", unique_indices=True)
        return flat.reshape((1,) + tuple(shape_tail))

    spec = P(axis)
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as shard_map
    fn = jax.jit(shard_map(shard_fn, mesh=mesh,
                           in_specs=(spec, spec), out_specs=spec))
    _builder_cache[key] = fn
    return fn


def materialize_sharded(mesh, axis, idx_parts, val_parts, shape_tail, dtype):
    """Build an ``(nparts, *shape_tail)`` array sharded over ``axis`` with
    ``out[p].reshape(-1)[idx_parts[p]] = val_parts[p]`` and zeros elsewhere.

    ``idx_parts[p]``: int array of flat indices into one shard's output
    (unique per shard); ``val_parts[p]``: matching values.
    """
    nparts = len(idx_parts)
    shape_tail = tuple(int(s) for s in shape_tail)
    per_size = int(np.prod(shape_tail))
    dtype = np.dtype(dtype)
    total_bytes = nparts * per_size * dtype.itemsize
    sharding = NamedSharding(mesh, P(axis))

    want_device = total_bytes >= DEVICE_BUILD_MIN_BYTES and per_size < 2**31
    if want_device and dtype == np.float64 and not jax.config.jax_enable_x64:
        want_device = False  # jnp would silently downcast the staging values

    if not want_device:
        out = np.zeros((nparts, per_size), dtype)
        for p in range(nparts):
            if len(idx_parts[p]):
                out[p][np.asarray(idx_parts[p])] = val_parts[p]
        return jax.device_put(out.reshape((nparts,) + shape_tail), sharding)

    nnz_pad = _pow2ceil(max(1, max(len(i) for i in idx_parts)))
    idx_st = np.full((nparts, nnz_pad), -1, np.int32)
    val_st = np.zeros((nparts, nnz_pad), dtype)
    for p in range(nparts):
        k = len(idx_parts[p])
        if k:
            idx_st[p, :k] = idx_parts[p]
            val_st[p, :k] = val_parts[p]
    idx_d = jax.device_put(idx_st, sharding)
    val_d = jax.device_put(val_st, sharding)
    fn = _scatter_builder(mesh, axis, shape_tail, dtype, nnz_pad)
    return fn(idx_d, val_d)
