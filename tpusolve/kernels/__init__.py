"""Custom-kernel workspace.

Current state: **the hot path needs no Pallas kernel.**  Measured on
TPU v5e (128^3 27-pt stencil, f32, per-SpMV slope timing):

=====================================================  ============
formulation                                            effective BW
=====================================================  ============
padded-ELL, XLA gather (x[cols])                       ~0.9 GB/s
1-D DIA, jnp.concatenate shifts                        ~70  GB/s
1-D DIA, pad-once + static slices                      ~87  GB/s
2-D (rows,128) DIA, static slices                      ~70  GB/s
Pallas kernel, 1-D unaligned vector loads              unsupported
Pallas kernel, lane rolls (pltpu.roll) per diagonal    ~7   GB/s
**3-D box DIA, static slices (shipped)**               **730-840 GB/s**
=====================================================  ============

Conclusions that shape the format layer (tpusolve/matrix):

* XLA gathers cost ~9 ns/element regardless of column locality (random vs
  banded identical) — slope-timed, 496 ms per 128^3 27-wide SpMV.
* XLA fuses *static multi-dim slices of one padded buffer* into a single
  streaming pass at ~90% of HBM speed of light — when the array's minor dim
  stays lane-aligned (the 3-D box view).  Flattened views force relayouts.
* Per-diagonal ``reshape`` of a (D, R) array is a physical tile-relayout
  copy: DIA values must be *stored* box-shaped.
* ``shard_map`` and leading-axis squeezes are free.
* Mosaic rejects unaligned 1-D vector loads, and lane ``roll``s are ~100x
  too slow to build a gather-free SpMV from — the XLA formulation wins.

Round 2 added the **block-ELL (BELL) unstructured fast path** (bell.py) and
measured it on v5e (2M rows / 7M nnz, jittered-stencil pattern,
DIA-ineligible, K = 9 tiles per 8-row group, tile fill 2.3%):

=====================================================  ============
formulation                                            per SpMV
=====================================================  ============
padded-ELL, XLA gather (x[cols])                       ~60   ms (est)
BELL, Pallas kernel (x in VMEM, SMEM ids, streamed)     5.23 ms
**BELL, XLA row-gather + batched contraction**          3.19 ms
=====================================================  ============

* XLA gathers of full (1, 128) rows are ~3 orders cheaper per byte than
  element gathers — the entire BELL design keys off that asymmetry.
* The XLA formulation streams tiles at 378 GB/s (46% of SoL); the Pallas
  kernel at 231 GB/s (per-tile scalar work dominates its inner loop), so
  ``BELL_IMPL = "xla"`` is the default and the Pallas kernel stays as the
  selectable alternative.
* Effective bandwidth is set by tile fill: 18 GB/s at 2.3% fill here;
  denser (multi-dof / reordered) matrices scale proportionally.

Round 2 (cont.) added the **BDIA blocked-DIA fast path** (bdia.py) for
banded/RCM-ordered unstructured matrices, with a Pallas kernel built on
dynamic-row-start VMEM reads + one dynamic lane rotation per offset slot.
Measured on v5e (96^3 27-pt graph assembled as unstructured, 0.9M rows /
23M nnz, DIA disabled):

=====================================================  ============
formulation                                            effective BW
=====================================================  ============
BELL 128-wide windows (K=9, fill 3.4%)                  38   GB/s
BELL 16-wide packed subwindows (fill 6.9%)              19   GB/s (issue-bound)
BDIA XLA vmap(dynamic_slice) windows                     1.5 GB/s (element gather)
BDIA Pallas, rolled slot loop, R=512                    48   GB/s
BDIA Pallas, rolled slot loop, R=2048                  179   GB/s
**BDIA Pallas, fully unrolled slots (shipped)**        **762 GB/s (93% SoL)**
=====================================================  ============

* ``vmap(dynamic_slice)`` lowers to an element gather — contiguous window
  reads must be expressed *inside* a Pallas kernel to run at stream rate.
* Narrow (sub-128) tiles lose even when they cut bytes 2-3x: VPU issue
  cost is per-*op*, so (8,16) mini-ops run ~4x slower than their byte
  footprint.  Full-width ops on bigger blocks (R=2048) amortize the
  per-slot overhead (measured ~87 ns/slot at R=512).
* Assembly-time selection (matrix/sharded.py) picks DIA -> BDIA -> BELL ->
  ELL by a calibrated time model (bdia.model_time_s); scattered patterns
  (uniform jitter) correctly fall back to BELL.

Round 3 added the **BDIA-XL panel-streaming variant** (bdia.py): x stays
in HBM and each grid step DMAs its blocks' contiguous panel into a
double-buffered VMEM scratch — lifting the whole-x-in-VMEM limit (~3M f32
rows/shard) to arbitrary shard sizes.  Measured 632 GB/s stream rate (77%
of SoL) at 10.5M rows on one v5e chip.  Round 3 also shipped the bf16
smoother-stream candidate as ``smoother_dtype: bfloat16`` (XLA layouts
only: promotion handles the mixed-dtype multiply, accumulation stays in
the solve dtype), and moved the AMG *setup* itself onto the device —
single-chip (amg/device_setup.py: offset-lattice scan contractions) and
sharded (amg/device_setup_sharded.py: ppermute halo exchanges) — where
every stage is the same shifted streaming pattern as the DIA SpMV.

Remaining Pallas candidates for future rounds (kept here as the workspace):
fused SpMV+dot for PCG (saves one vector read per iteration), halo exchange
via ``make_async_remote_copy`` overlapping the interior DIA sweep, BDIA
per-block overflow lists (boundary rows currently inflate the uniform D),
and bf16 value streams for the BDIA/BELL Pallas kernels.
"""
