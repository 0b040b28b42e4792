"""Benchmark: SpMV effective bandwidth on the 27-pt weak-scaling fixture.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star SpMV target is >= 80% of HBM speed-of-light (BASELINE.md);
``vs_baseline`` therefore reports achieved_bandwidth / (0.8 * HBM_BW) for
the detected device, so >= 1.0 means the target is met.

Effective bytes per SpMV use the standard sparse accounting: values + column
indices + input vector + output vector, over the *padded* arrays the kernel
actually reads (padding rides along in the ELL layout).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# HBM speed-of-light per device generation (GB/s)
HBM_GBPS = {
    "v6e": 1640.0, "v6 lite": 1640.0,
    "v5p": 2765.0,
    "v5e": 819.0, "v5 lite": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
    "cpu": 50.0,
}


def device_hbm_gbps(kind: str) -> float:
    kind = kind.lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpusolve.mesh import make_mesh
    from tpusolve.stencil import laplace27
    from tpusolve.matrix.spmv import spmv

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu") or "cpu"
    on_cpu = dev.platform == "cpu"
    side = 64 if on_cpu else 128          # per-device box (ref default 128^3)

    mesh = make_mesh(1)
    A, b, _ = laplace27(mesh, side, side, side, dtype=np.float32)
    n = A.shape[0]

    # bytes actually streamed per SpMV (format-dependent) + vector I/O
    itemsize = 4
    if A.uses_dia:
        mat_bytes = int(np.prod(A.dia_vals.shape)) * itemsize  # values only
    else:
        mat_bytes = 2 * int(np.prod(A.diag_vals.shape)) * itemsize
    if A.has_offd:
        mat_bytes += 2 * int(np.prod(A.offd_vals.shape)) * itemsize
    bytes_per = (mat_bytes
                 + A.padded_ncols * itemsize         # x read
                 + A.padded_nrows * itemsize)        # y write
    # One chain, with the fixed per-call dispatch overhead (tens of ms
    # through remote TPU relays) calibrated by a trivial jitted call and
    # subtracted — single-call timing alone is 5-80x off on such backends.
    n_it = 192

    @jax.jit
    def chain(x):
        # power-iteration-style chain keeps data on device; scaling by the
        # spectral bound prevents overflow
        def body(_, x):
            return spmv(A, x) * jnp.float32(1.0 / 52.0)
        y = lax.fori_loop(0, n_it, body, x)
        return jnp.sum(jnp.abs(y))         # scalar forces real execution

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * jnp.float32(1.0)

    float(trivial(b))                      # compile + warm the d2h path
    float(chain(b))                        # compile + warm up
    overhead = float("inf")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(b))
        overhead = min(overhead, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(b))
        best = min(best, time.perf_counter() - t0)
    per_spmv = max(best - overhead, 1e-9) / n_it
    gbps = bytes_per / per_spmv / 1e9

    sol = device_hbm_gbps(kind)
    target = 0.8 * sol
    print(json.dumps({
        "metric": f"spmv_effective_bandwidth_27pt_{side}^3_f32",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
    }), flush=True)
    print(f"# device={kind} n={n} nnz={A.nnz} bytes/spmv={bytes_per/1e6:.1f}MB "
          f"per_spmv={per_spmv*1e3:.3f}ms sol={sol}GB/s "
          f"target(0.8*sol)={target}GB/s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
