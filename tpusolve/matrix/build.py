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

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Outputs at least this large are scatter-built on device; smaller ones are
# filled on host.  The tradeoff is environment-dependent:
#
# * a device build costs one XLA compilation per new output shape — measured
#   ~7 s per shape through remote-compile relays (axon tunnel), ~0.5 s on a
#   directly-attached TPU.  AMG hierarchies produce a fresh shape per level,
#   so naive device builds pay that compile per level per array.
# * a host build costs first-touch page faults on the padded array plus the
#   host->device transfer of the *expanded* bytes.  On paravirtual hosts with
#   slow fault handling (measured ~45 us/4KB page on Firecracker-style VMs)
#   a GB-scale host fill costs minutes; on this-class hosts it is ~2 us/page
#   and a 1 GB fill + transfer is ~2 s.
#
# So the threshold is calibrated once at import-from-use time: probe the
# host's page-touch rate and pick 64 MB (slow-fault hosts) or ~1.5 GB (fast
# hosts).  TPUSOLVE_DEVICE_BUILD_MIN_MB overrides.
_DEFAULT_MIN_BYTES = 64 << 20
_threshold_cache: list = []


def device_build_min_bytes() -> int:
    if _threshold_cache:
        return _threshold_cache[0]
    env = os.environ.get("TPUSOLVE_DEVICE_BUILD_MIN_MB")
    if env is not None:
        val = int(float(env) * (1 << 20))
    else:
        # touch one page per 4 KB of a fresh 32 MB allocation
        probe = np.zeros(8 << 20, np.float32)
        t0 = time.perf_counter()
        probe[::1024] = 1.0
        per_page = (time.perf_counter() - t0) / (len(probe) // 1024)
        val = _DEFAULT_MIN_BYTES if per_page > 8e-6 else (1536 << 20)
    _threshold_cache.append(val)
    return val


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

    want_device = total_bytes >= device_build_min_bytes() and per_size < 2**31
    if want_device and dtype == np.float64 and not jax.config.jax_enable_x64:
        want_device = False  # jnp would silently downcast the staging values

    log_on = os.environ.get("TPUSOLVE_SETUP_LOG", "0") == "1"
    if not want_device:
        t0 = time.perf_counter()
        out = np.zeros((nparts, per_size), dtype)
        for p in range(nparts):
            if len(idx_parts[p]):
                out[p][np.asarray(idx_parts[p])] = val_parts[p]
        t1 = time.perf_counter()
        res = jax.device_put(out.reshape((nparts,) + shape_tail), sharding)
        if log_on and total_bytes > (64 << 20):
            res.block_until_ready()
            print(f"      materialize host {total_bytes/1e6:.0f}MB "
                  f"fill {t1 - t0:.2f}s put {time.perf_counter() - t1:.2f}s",
                  flush=True)
        return res

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
