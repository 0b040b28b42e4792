"""BDIA (blocked-DIA) — the unstructured-SpMV fast path for banded matrices.

The role the reference fills with vendor SpMV on its file-loaded nalu-wind
systems (toggle ref: src/main.cpp:137-145; readers src/HypreSystem.cpp:
1021-1969): those matrices are unstructured, but after bandwidth-reducing
(RCM) ordering their entries hug the diagonal — *almost* DIA, except the
offset set drifts from row to row, so global DIA storage explodes.

BDIA localizes DIA: rows are cut into blocks of ``R`` (default 256); each
block stores the union of its own (col - row) offsets:

* ``vals``:   (B, D, R) — per (block, offset-slot) coefficient rows
              (zeros in padding; D = max offsets per block, shard-uniform)
* ``starts``: (B, D) int32 — where each slot's x window begins in the
              zero-padded local x (start = xpad + b*R + offset)

SpMV is then, per (block, slot), one contiguous (R,)-window read of x and
one (R,)-wide fused multiply-add:

    y[b*R : (b+1)*R] = sum_d vals[b, d] * x_pad[starts[b, d] : +R]

**Zero per-element gathers.**  The x windows are fetched as B*D contiguous
1 KB slices (a `vmap`'d ``dynamic_slice`` = ``lax.gather`` with
``slice_sizes=(R,)``), which TPUs execute at streaming rate, and the
multiply-reduce is full-lane-width VPU work — unlike narrow-tile schemes,
which are issue-bound (measured: (8,16) mini-tiles ran 4x slower than
their byte footprint).  Streamed bytes per SpMV ~ 2 * B*D*R * itemsize
(vals + windows); effective bandwidth = CSR bytes / streamed bytes x HBM
rate, set by the *slot fill* nnz / (B*D*R) the ordering provides (natural
stencil order: 100% = global DIA; RCM'd meshes: tens of percent).

Selection between BDIA and BELL (kernels/bell.py, for clustered-but-
unbanded patterns) happens at assembly by comparing predicted streamed
bytes; ``plan`` tries several block sizes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BLOCK_SIZES = (2048, 1024, 512, 256, 128)  # candidate R values (multiples
                               # of 128: the kernel works on (R/128, 128)
                               # tiles; larger R = fewer per-slot overheads)

# calibrated kernel model: measured once on v5e — with the slot loop fully
# unrolled (D <= UNROLL_MAX) the kernel runs at stream rate (~12 ns/slot at
# rr=8); the rolled loop pays ~87 ns/slot of scalar overhead.  Other
# generations rescale by runtime.overhead_scale() (bandwidth ratio as the
# clock proxy) and use their own HBM rate — see runtime.device_profile().
UNROLL_MAX = 64
SLOT_FIXED_NS = 40.0       # rolled-loop per-slot overhead (v5e)
SLOT_PER_ROW_NS = 12.0     # per rr = R/128 (rolled, v5e)
UNROLLED_SLOT_NS = 4.0
UNROLLED_PER_ROW_NS = 1.0


def _per_slot_ns(D: int, R: int) -> float:
    from tpusolve import runtime
    if D <= UNROLL_MAX:
        ns = UNROLLED_SLOT_NS + UNROLLED_PER_ROW_NS * R / 128.0
    else:
        ns = SLOT_FIXED_NS + SLOT_PER_ROW_NS * R / 128.0
    return ns * runtime.overhead_scale()


def model_time_s(B: int, D: int, R: int, itemsize: int) -> float:
    """Predicted per-SpMV seconds for a (B, D, R) BDIA layout."""
    from tpusolve import runtime
    stream = 2.0 * B * D * R * itemsize / (runtime.hbm_gbps() * 1e9)
    return max(stream, B * D * _per_slot_ns(D, R) * 1e-9)


def plan_d(lr, lc, row_pad: int, col_pad: int, R: int) -> int:
    """Max distinct (col - row) offsets per R-row block for one shard's
    diag entries (the D this shard needs at block size R)."""
    if len(lr) == 0:
        return 0
    lr = np.asarray(lr, np.int64)
    d = np.asarray(lc, np.int64) - lr
    b = lr // R
    # offsets span [-(row_pad-1), col_pad-1] (rectangular operators too)
    W = row_pad + col_pad + 1
    keys = np.unique(b * W + (d + row_pad))
    B = (row_pad + R - 1) // R
    return max(1, int(np.bincount(keys // W, minlength=B).max()))


def plan_fill_profile(lr, lc, row_pad: int, col_pad: int,
                      R: int) -> np.ndarray:
    """Per-rank slot-fill profile at block size R: ``out[r]`` = total
    entries landing in each block's r-th *most-populated* offset slot,
    summed over the shard's blocks.  Capping the layout at D slots per
    block therefore overflows exactly ``out[D:].sum()`` entries — the
    trade-off the assembly-time selection optimizes (a single clipped
    boundary block would otherwise inflate the uniform D for the whole
    shard and push selection to BELL)."""
    if len(lr) == 0:
        return np.zeros(0, np.int64)
    lr = np.asarray(lr, np.int64)
    d = np.asarray(lc, np.int64) - lr
    b = lr // R
    W = row_pad + col_pad + 1
    uniq, counts = np.unique(b * W + (d + row_pad), return_counts=True)
    key_b = uniq // W
    # rank slots within each block by descending count (stable: offset
    # order breaks ties) — same ordering compact() assigns slots in
    order_u = np.lexsort((-counts, key_b))
    B = (row_pad + R - 1) // R
    blk_starts = np.searchsorted(key_b, np.arange(B + 1))
    rank_sorted = np.arange(uniq.size) - blk_starts[key_b[order_u]]
    maxrank = int(rank_sorted.max()) + 1
    return np.bincount(rank_sorted, weights=counts[order_u],
                       minlength=maxrank).astype(np.int64)


# per-element cost of the overflow gather+scatter-add (XLA gather measured
# ~9 ns/elem on v5e; scatter-add comparable — conservative combined figure)
OVF_NS_PER_ELEM = 25.0


def model_ovf_time_s(k: int) -> float:
    """Predicted seconds for a k-entry overflow gather/scatter pass."""
    from tpusolve import runtime
    return k * OVF_NS_PER_ELEM * 1e-9 * runtime.overhead_scale()


def compact(lr, lc, v, row_pad: int, col_pad: int, R: int, dmax: int,
            dtype=np.float32, overflow: bool = False):
    """Build one shard's BDIA staging.

    Returns (starts (B, dmax) int32 *relative to unpadded x* (may be
    negative), flat_idx, vals_ordered) — flat indices into the (B, dmax, R)
    value array, materialized on device (matrix/build.py).

    Slots are assigned within each block by DESCENDING fill, so when a
    block has more distinct offsets than ``dmax`` the entries that don't
    fit are the fewest possible.  With ``overflow=False`` (the strict
    default) that condition raises; with ``overflow=True`` the spilled
    entries are returned as three extra arrays (local rows, local cols,
    vals) for the per-block overflow list (applied in the SpMV as one
    small gather + scatter-add)."""
    B = (row_pad + R - 1) // R
    dmax = max(dmax, 1)
    starts = np.full((B, dmax), _SENTINEL, np.int64)
    lr = np.asarray(lr, np.int64)
    if lr.size == 0:
        starts[:] = np.clip(np.arange(B, dtype=np.int64) * R, 0,
                            max(0, col_pad - R))[:, None]
        empty = (starts, np.zeros(0, np.int64), np.zeros(0, dtype))
        if overflow:
            return empty + (np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0, dtype))
        return empty
    lc = np.asarray(lc, np.int64)
    d = lc - lr
    v = np.asarray(v, dtype)
    b = lr // R
    W = row_pad + col_pad + 1
    key = b * W + (d + row_pad)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    flag = np.empty(key_s.size, bool)
    flag[0] = True
    np.not_equal(key_s[1:], key_s[:-1], out=flag[1:])
    uniq = key_s[flag]
    slot_of_key = np.cumsum(flag) - 1
    counts_u = np.diff(np.append(np.flatnonzero(flag), key_s.size))
    key_b = uniq // W
    blk_starts = np.searchsorted(key_b, np.arange(B + 1))
    # rank slots within each block by descending fill (stable tie-break on
    # offset order) — a dmax cap then overflows the emptiest slots
    order_u = np.lexsort((-counts_u, key_b))
    rank_sorted = np.arange(uniq.size) - blk_starts[key_b[order_u]]
    rank_u = np.empty(uniq.size, np.int64)
    rank_u[order_u] = rank_sorted
    over_u = rank_u >= dmax
    if over_u.any() and not overflow:
        raise ValueError("dmax too small for this shard")
    keep_u = ~over_u
    starts[key_b[keep_u], rank_u[keep_u]] = \
        key_b[keep_u] * R + (uniq[keep_u] % W) - row_pad
    slot = rank_u[slot_of_key]
    lro, lco, vo = lr[order], lc[order], v[order]
    keep = slot < dmax
    flat_idx = (lro[keep] // R * dmax + slot[keep]) * R + lro[keep] % R
    # unused slots: park them on a window near the block's own diagonal
    # (vals are zero there, so any in-range window works) — parking at a
    # *nearby* window keeps each block's window span tight, which the
    # panel-streaming (XL) kernel relies on
    park = np.clip(np.arange(B, dtype=np.int64) * R, 0,
                   max(0, col_pad - R))
    parked = starts == _SENTINEL
    starts = np.where(parked, park[:, None], starts)
    if overflow:
        spill = ~keep
        return (starts, flat_idx, vo[keep],
                lro[spill], lco[spill], vo[spill])
    return starts, flat_idx, vo


_SENTINEL = np.iinfo(np.int64).min // 2


def finalize_starts(starts: np.ndarray, col_pad: int, R: int):
    """Shift per-shard window starts into the zero-padded x coordinate
    system.  Returns (starts_adj int32, xpad_lo, xlen)."""
    lo = int(min(0, starts.min()))
    hi = int(max(col_pad, starts.max() + R))
    xpad_lo = -lo
    xlen = xpad_lo + hi
    return (starts + xpad_lo).astype(np.int32), xpad_lo, xlen


def bdia_spmv_local(vals, starts, x, xpad_lo: int, xlen: int, row_pad: int):
    """Reference/XLA formulation (CPU tests): window reads via vmap'd
    dynamic_slice.  XLA lowers this to an element gather — use the pallas
    kernel on TPU (selected in matrix/spmv.py)."""
    B, D, R = vals.shape
    xp = jnp.pad(x, (xpad_lo, max(0, xlen - xpad_lo - x.shape[0])))
    win = jax.vmap(lambda s: lax.dynamic_slice(xp, (s,), (R,)))(
        starts.reshape(-1))
    win = win.reshape(B, D, R)
    y = jnp.sum(vals * win, axis=1)
    return y.reshape(-1)[:row_pad]


try:  # pallas import kept optional: CPU test environments lack Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE = 128

# x64-proof index-map constant: a python-int 0 in a BlockSpec index map
# traces as an i64 under jax_enable_x64, and Mosaic cannot legalize the
# (i32, i64) index-map return
_I0 = np.int32(0)


# R-row blocks processed per pallas grid step (SMEM/VMEM block shapes need
# a sublane-divisible leading dim)
_PALLAS_GB = 8


def _bdia_kernel(starts_ref, x2d_ref, vals_ref, out_ref, *, d: int, rr: int,
                 gb: int):
    """One grid step = ``gb`` R-row blocks (R = rr * 128).

    Per offset slot: one dynamic-row-start (rr+1, 128) read of x from VMEM,
    one dynamic lane rotation (pltpu.roll) to align the window start, a
    two-way select for the sublane carry, and a full-width FMA.  The vals
    stream (B, D, R) is the only HBM traffic, double-buffered by the grid
    pipeline; zero per-element gathers anywhere."""
    lanes = lax.broadcasted_iota(jnp.int32, (rr, LANE), 1)

    def block(g, _):
        def slot(dd, acc):
            s = starts_ref[g, dd]
            # starts are non-negative: truncated lax.div/rem avoid jnp's
            # sign-correction ops (whose pvary has no Pallas lowering)
            lane = jnp.int32(LANE)
            row = lax.div(s, lane)
            rem = lax.rem(s, lane)
            seg = x2d_ref[pl.ds(row, rr + 1), :]          # (rr+1, 128)
            rot = pltpu.roll(seg, lax.rem(lane - rem, lane), 1)
            win = jnp.where(lanes < LANE - rem, rot[:rr], rot[1:rr + 1])
            v = vals_ref[g, dd].reshape(rr, LANE)
            return acc + v * win
        # Mosaic supports only full unrolling; do it (as a python loop, so
        # no loop carry exists at all) for moderate D — it removes the
        # per-slot scalar loop overhead and lets the compiler pipeline the
        # slots (measured 10x on v5e: 73 -> 702 GB/s effective).  Loop
        # carries must be int32: under jax_enable_x64, python-int bounds
        # trace as i64 counters, which Mosaic cannot legalize.
        acc = jnp.zeros((rr, LANE), vals_ref.dtype)
        if d <= UNROLL_MAX:
            for dd in range(d):
                acc = slot(jnp.int32(dd), acc)
        else:
            acc = lax.fori_loop(jnp.int32(0), jnp.int32(d), slot, acc)
        out_ref[g] = acc.reshape(-1)
        return _

    lax.fori_loop(jnp.int32(0), jnp.int32(gb), block, None)


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(x) - 1).bit_length()


def plan_panels(starts_adj: np.ndarray, R: int, gb: int = _PALLAS_GB):
    """Panel plan for the XL (x-streaming) kernel.

    For each grid step (``gb`` consecutive R-row blocks) the kernel DMAs one
    contiguous panel of the lane-matrix view of x from HBM into VMEM; this
    works because banded (RCM-ordered) matrices keep every block's window
    starts within a narrow span.  Returns ``(rowstart, pxrows, xrows_min)``:
    per-step first panel row (int32, one per step plus a trailing repeat for
    the prefetch lookahead), the pow2-padded panel height, and the minimum
    padded row count of the x lane-matrix.
    """
    B, D = starts_adj.shape
    rr = R // LANE
    Bp = ((B + gb - 1) // gb) * gb
    if Bp != B:  # pad with the last block's starts (keeps spans tight)
        starts_adj = np.concatenate(
            [starts_adj, np.repeat(starts_adj[-1:], Bp - B, axis=0)])
    rows = (starts_adj // LANE).reshape(-1, gb, D)
    min_r = rows.min(axis=(1, 2))
    max_r = rows.max(axis=(1, 2))
    span = int((max_r - min_r).max()) + rr + 1
    pxrows = max(8, _pow2ceil(span))
    rowstart = np.concatenate([min_r, min_r[-1:]]).astype(np.int32)
    xrows_min = int(rowstart.max()) + pxrows
    return rowstart, pxrows, xrows_min


def model_time_xl_s(B: int, D: int, R: int, pxrows: int, itemsize: int,
                    gb: int = _PALLAS_GB) -> float:
    """Predicted per-SpMV seconds for the XL layout: vals stream once,
    plus one x panel per grid step."""
    from tpusolve import runtime
    nsteps = (B + gb - 1) // gb
    stream = (B * D * R + nsteps * pxrows * LANE) * itemsize / \
        (runtime.hbm_gbps() * 1e9)
    return max(stream, B * D * _per_slot_ns(D, R) * 1e-9)


def _bdia_kernel_xl(rowstart_ref, starts_ref, vals_ref, x_hbm_ref, out_ref,
                    xbuf, sem, *, d: int, rr: int, gb: int, pxrows: int,
                    nsteps: int):
    """XL grid step: DMA this step's x panel (double-buffered: the next
    step's panel is prefetched during compute), then the same per-slot
    rotate-FMA as the whole-x kernel with rows rebased to the panel."""
    i = pl.program_id(0)
    two = jnp.int32(2)
    one = jnp.int32(1)
    slot = lax.rem(i, two)

    def dma(j, s):
        return pltpu.make_async_copy(
            x_hbm_ref.at[pl.ds(rowstart_ref[j], pxrows), :],
            xbuf.at[s], sem.at[s])

    @pl.when(i == 0)
    def _warm():
        # int32 indices: python-int 0 traces as i64 under jax_enable_x64,
        # which Mosaic's memref_slice rejects
        dma(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + one < nsteps)
    def _prefetch():
        dma(i + one, lax.rem(i + one, two)).start()

    dma(i, slot).wait()

    base = rowstart_ref[i]
    lanes = lax.broadcasted_iota(jnp.int32, (rr, LANE), 1)

    def block(g, _):
        def slotf(dd, acc):
            s = starts_ref[g, dd]
            lane = jnp.int32(LANE)
            row = lax.div(s, lane) - base
            rem = lax.rem(s, lane)
            seg = xbuf[slot, pl.ds(row, rr + 1), :]       # (rr+1, 128)
            rot = pltpu.roll(seg, lax.rem(lane - rem, lane), 1)
            win = jnp.where(lanes < LANE - rem, rot[:rr], rot[1:rr + 1])
            v = vals_ref[g, dd].reshape(rr, LANE)
            return acc + v * win
        acc = jnp.zeros((rr, LANE), vals_ref.dtype)
        if d <= UNROLL_MAX:   # full unroll as a python loop (see _bdia_kernel)
            for dd in range(d):
                acc = slotf(jnp.int32(dd), acc)
        else:
            acc = lax.fori_loop(jnp.int32(0), jnp.int32(d), slotf, acc)
        out_ref[g] = acc.reshape(-1)
        return _
    lax.fori_loop(jnp.int32(0), jnp.int32(gb), block, None)


def bdia_spmv_pallas_xl(vals, starts, rowstart, pxrows: int, xrows: int, x,
                        xpad_lo: int, xlen: int, row_pad: int,
                        interpret: bool = False, vma=None):
    """Panel-streaming BDIA SpMV: x lives in HBM; each grid step DMAs the
    panel covering its blocks' windows.  Lifts the whole-x kernel's
    x-fits-in-VMEM (~12 MB => ~3M f32 rows/shard) limit to gate-3 shard
    sizes (10M+ rows) for banded matrices.  ``xrows`` is the static padded
    row count of the x lane-matrix (>= plan_panels xrows_min)."""
    if not HAVE_PALLAS:  # pragma: no cover
        return bdia_spmv_local(vals, starts, x, xpad_lo, xlen, row_pad)
    B, D, R = vals.shape
    rr = R // LANE
    gb = _PALLAS_GB
    Bp = ((B + gb - 1) // gb) * gb
    nsteps = Bp // gb
    if Bp != B:
        vals = jnp.pad(vals, ((0, Bp - B), (0, 0), (0, 0)))
        # pad with the last block's starts: inside its step's panel
        starts = jnp.concatenate(
            [starts, jnp.repeat(starts[-1:], Bp - B, axis=0)])
    xp = jnp.pad(x, (xpad_lo, max(0, xlen - xpad_lo - x.shape[0])))
    xp = jnp.pad(xp, (0, xrows * LANE - xp.shape[0]))
    x2d = xp.reshape(xrows, LANE)
    y = pl.pallas_call(
        functools.partial(_bdia_kernel_xl, d=D, rr=rr, gb=gb,
                          pxrows=pxrows, nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[
            # whole-array specs carry explicit int32 index maps (a default
            # map's python-int 0 traces as i64 under x64 — Mosaic rejects it)
            pl.BlockSpec(rowstart.shape, lambda i: (_I0,),
                         memory_space=pltpu.SMEM),       # rowstart whole
            pl.BlockSpec((gb, D), lambda i: (i, _I0),
                         memory_space=pltpu.SMEM),       # window starts
            pl.BlockSpec((gb, D, R), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),       # coefficient stream
            pl.BlockSpec((xrows, LANE), lambda i: (_I0, _I0),
                         memory_space=pl.ANY),           # x2d stays in HBM
        ],
        out_specs=pl.BlockSpec((gb, R), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, R), vals.dtype,
                                       vma=frozenset(vma) if vma else None),
        scratch_shapes=[
            pltpu.VMEM((2, pxrows, LANE), vals.dtype),   # panel double-buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rowstart, starts, vals, x2d)
    return y.reshape(-1)[:row_pad]


def bdia_spmv_pallas(vals, starts, x, xpad_lo: int, xlen: int, row_pad: int,
                     interpret: bool = False, vma=None):
    """Pallas formulation: x whole in VMEM (as a (rows, 128) matrix), the
    per-block coefficient slabs streamed from HBM."""
    if not HAVE_PALLAS:  # pragma: no cover
        return bdia_spmv_local(vals, starts, x, xpad_lo, xlen, row_pad)
    B, D, R = vals.shape
    rr = R // LANE
    gb = _PALLAS_GB
    Bp = ((B + gb - 1) // gb) * gb
    if Bp != B:
        # extra blocks carry zero vals and window-0 starts — harmless reads
        vals = jnp.pad(vals, ((0, Bp - B), (0, 0), (0, 0)))
        starts = jnp.pad(starts, ((0, Bp - B), (0, 0)))
    xp = jnp.pad(x, (xpad_lo, max(0, xlen - xpad_lo - x.shape[0])))
    # pad up to whole lanes plus rr+1 guard rows for the widest read
    xrows = (xp.shape[0] + LANE - 1) // LANE + rr + 1
    xp = jnp.pad(xp, (0, xrows * LANE - xp.shape[0]))
    x2d = xp.reshape(xrows, LANE)
    y = pl.pallas_call(
        functools.partial(_bdia_kernel, d=D, rr=rr, gb=gb),
        grid=(Bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, D), lambda i: (i, _I0),
                         memory_space=pltpu.SMEM),      # window starts
            # x2d whole: the index map is explicit so no python-int (i64
            # under x64) default map reaches Mosaic
            pl.BlockSpec((xrows, LANE), lambda i: (_I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, D, R), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),      # coefficient stream
        ],
        out_specs=pl.BlockSpec((gb, R), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, R), vals.dtype,
                                       vma=frozenset(vma) if vma else None),
        interpret=interpret,
    )(starts, x2d, vals)
    return y.reshape(-1)[:row_pad]
