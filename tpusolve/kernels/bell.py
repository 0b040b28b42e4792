"""Block-ELL (BELL) — the unstructured-SpMV fast path.

The ELL fallback performs one XLA *element* gather per nonzero, measured at
~9 ns/element on v5e (see package docstring) — unusable for the reference's
file-loaded nalu-wind systems (MM reader ref: src/HypreSystem.cpp:1613-1969;
IJ reader :1021-1318), which are unstructured and never DIA-eligible.

BELL restructures the local diag block into dense (tm x tn) = (8 x 128)
tiles — one tile per nonempty (8-row group, 128-column window) pair, padded
block-ELL style to ``K`` tiles per group:

* ``vals``: (G, K, 8, 128) dense tile values (zeros in padding)
* ``ids``:  (G, K) int32 column-window index per tile

SpMV then needs **one 128-lane row gather per tile** instead of one element
gather per nonzero, and the multiply-reduce is a dense (8,128)x(128,)
contraction — both operations TPUs execute at streaming rate.  The cost
model is therefore ``tiles * 4 KB`` streamed per SpMV: effective bandwidth =
(CSR bytes / streamed bytes) x HBM rate, set by the tile fill the matrix's
column locality provides (mesh matrices: a few percent to ~25%; raise it by
bandwidth-reducing ordering).

Two interchangeable local kernels (selection = the TPU analog of the
reference's vendor-SpMV toggle, src/main.cpp:137-145):

* ``bell_spmv_local``   — pure XLA: one row gather + batched contraction.
* ``bell_spmv_pallas``  — Pallas kernel: x resident in VMEM, tiles streamed
  from HBM with the grid pipeline, explicit per-tile dynamic-slice gather.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

TM = 8    # tile rows (f32 sublane quantum)
TN = 128  # tile cols (lane width)


# ----------------------------------------------------------------------
# Host-side assembly
# ----------------------------------------------------------------------

def _sorted_unique_inverse(key_s: np.ndarray):
    """(uniq, inverse) of an already-sorted key array — O(n), no re-sort
    (``np.unique(..., return_inverse=True)`` re-sorts and was measured
    pathologically slow on large inputs)."""
    flag = np.empty(key_s.size, bool)
    flag[0] = True
    np.not_equal(key_s[1:], key_s[:-1], out=flag[1:])
    return key_s[flag], np.cumsum(flag) - 1


def bell_plan_k(lr: np.ndarray, lc: np.ndarray, row_pad: int) -> int:
    """Max tiles per 8-row group for one shard's entries (K before
    cross-shard padding)."""
    if lr.size == 0:
        return 0
    gid = np.asarray(lr, np.int64) // TM
    wid = np.asarray(lc, np.int64) // TN
    nwin = int(wid.max()) + 1
    keys = np.unique(gid * nwin + wid)
    return int(np.bincount(keys // nwin, minlength=_ngroups(row_pad)).max())


def _ngroups(row_pad: int) -> int:
    return max(1, (row_pad + TM - 1) // TM)


def bell_compact(lr, lc, v, row_pad: int, col_pad: int, kmax: int,
                 dtype=np.float32):
    """Plan one shard's BELL layout without materializing the dense tiles.

    Returns ``(ids, flat_idx, vals_ordered)``: ``ids`` is the small
    (G, kmax) int32 tile->column-window table; ``flat_idx``/``vals_ordered``
    are nnz-compact scatter staging for the (G, kmax, 8, 128) value array
    (``tiles.reshape(-1)[flat_idx] = vals_ordered``) — materialized on
    device (see matrix/build.py; the dense expansion can be 100x nnz).
    """
    G = _ngroups(row_pad)
    kmax = max(kmax, 1)
    ids = np.zeros((G, kmax), np.int32)
    lr = np.asarray(lr, np.int64)
    if lr.size == 0:
        return ids, np.zeros(0, np.int64), np.zeros(0, dtype)
    lc = np.asarray(lc, np.int64)
    v = np.asarray(v, dtype)
    gid = lr // TM
    wid = lc // TN
    nwin = (col_pad + TN - 1) // TN
    key = gid * nwin + wid
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, tile_of = _sorted_unique_inverse(key_s)
    # slot of each tile within its group (tiles sorted by key => by gid)
    tile_gid = uniq // nwin
    starts = np.searchsorted(tile_gid, np.arange(G + 1))
    slot_of_tile = np.arange(uniq.size) - starts[tile_gid]
    if uniq.size and slot_of_tile.max() >= kmax:
        raise ValueError("kmax too small for this shard")
    ids[tile_gid, slot_of_tile] = (uniq % nwin).astype(np.int32)
    slot = slot_of_tile[tile_of]                 # per (sorted) entry
    lro, lco, vo = lr[order], lc[order], v[order]
    flat_idx = ((lro // TM * kmax + slot) * TM + lro % TM) * TN + lco % TN
    return ids, flat_idx, vo


def bell_from_entries(lr, lc, v, row_pad: int, col_pad: int, kmax: int,
                      dtype=np.float32):
    """Host-materialized variant of :func:`bell_compact` (small shards,
    tests).  Returns (vals (G, kmax, 8, 128), ids (G, kmax) int32)."""
    ids, flat_idx, vo = bell_compact(lr, lc, v, row_pad, col_pad, kmax, dtype)
    G = _ngroups(row_pad)
    vals = np.zeros(G * max(kmax, 1) * TM * TN, dtype)
    vals[flat_idx] = vo
    return vals.reshape(G, max(kmax, 1), TM, TN), ids


# ----------------------------------------------------------------------
# Device kernels
# ----------------------------------------------------------------------

def _x_windows(x, nwin: int):
    """Local x as (nwin, 128) window matrix (zero-padded)."""
    need = nwin * TN
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    return x[:need].reshape(nwin, TN)


def bell_spmv_local(vals, ids, x, nwin: int, row_pad: int):
    """XLA formulation: row-gather the tiles' x windows, then a batched
    (8, K*128) @ (K*128,) contraction per group."""
    x2d = _x_windows(x, nwin)
    g = x2d[ids]                                   # (G, K, 128) row gather
    y = jnp.einsum("gkrc,gkc->gr", vals, g,
                   preferred_element_type=vals.dtype)
    return y.reshape(-1)[:row_pad]


try:  # pallas import kept optional: CPU test environments lack Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# groups processed per pallas grid step: vals block = GB*K*4KB in VMEM
_PALLAS_GB = 8

# x64-proof index-map constant (see kernels/bdia.py:_I0)
_I0 = np.int32(0)


def _bell_kernel(ids_ref, x2d_ref, vals_ref, out_ref, *, k: int, gb: int):
    """One grid step: ``gb`` row groups, ``k`` tiles each.

    x2d lives whole in VMEM; ``ids`` arrives as a per-step SMEM block
    (scalar-prefetching the whole array would blow the 1 MB SMEM).  Per tile:
    one dynamic (1, 128) row read and one (8, 128) fused multiply-accumulate.
    The tile stream (vals) is the only HBM traffic, double-buffered by the
    pallas grid pipeline.
    """
    def group(g, _):
        def tile(kk, acc):
            cid = ids_ref[g, kk]
            xrow = x2d_ref[cid, :]                       # (128,)
            return acc + vals_ref[g, kk] * xrow[None, :]
        # int32 loop bounds: under jax_enable_x64 python-int bounds trace
        # as i64 loop carries, which Mosaic cannot legalize
        acc = lax.fori_loop(jnp.int32(0), jnp.int32(k), tile,
                            jnp.zeros((TM, TN), vals_ref.dtype))
        out_ref[g] = jnp.sum(acc, axis=-1)               # (8,)
        return _

    lax.fori_loop(jnp.int32(0), jnp.int32(gb), group, None)


def bell_spmv_pallas(vals, ids, x, nwin: int, row_pad: int,
                     interpret: bool = False, vma=None):
    """Pallas formulation (x in VMEM, tiles streamed).

    ``vma``: mesh axes the output varies over — required when called inside
    ``shard_map`` with varying-mesh-axis checking (jax >= 0.7)."""
    if not HAVE_PALLAS:  # pragma: no cover
        return bell_spmv_local(vals, ids, x, nwin, row_pad)
    G, K = ids.shape
    gb = _PALLAS_GB
    Gp = ((G + gb - 1) // gb) * gb
    if Gp != G:
        vals = jnp.pad(vals, ((0, Gp - G), (0, 0), (0, 0), (0, 0)))
        ids = jnp.pad(ids, ((0, Gp - G), (0, 0)))
    x2d = _x_windows(x, nwin)
    grid = (Gp // gb,)
    y = pl.pallas_call(
        functools.partial(_bell_kernel, k=K, gb=gb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gb, K), lambda i: (i, _I0),
                         memory_space=pltpu.SMEM),       # per-step tile ids
            # x2d whole in VMEM: explicit index map so no python-int (i64
            # under x64) default map reaches Mosaic
            pl.BlockSpec(x2d.shape, lambda i: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, K, TM, TN), lambda i: (i, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),       # tile stream
        ],
        out_specs=pl.BlockSpec((gb, TM), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, TM), vals.dtype,
                                       vma=frozenset(vma) if vma else None),
        interpret=interpret,
    )(ids, x2d, vals)
    return y.reshape(-1)[:row_pad]
