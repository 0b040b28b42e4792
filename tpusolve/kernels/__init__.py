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

Remaining Pallas candidates for future rounds (kept here as the workspace):
fused SpMV+dot for PCG (saves one vector read per iteration), halo exchange
via ``make_async_remote_copy`` overlapping the interior DIA sweep, and a
block-ELL MXU kernel for genuinely unstructured matrices (the ELL-gather
fallback is the framework's one slow path).
"""
