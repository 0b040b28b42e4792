"""Round-4 probe: 256^3 (16.8M-row) device AMG setup, cold THEN warm in one
process, with per-phase logs — the warm breakdown drives the <=60 s work
(VERDICT r3 #2).  Run alone on the live TPU:

    PYTHONPATH=/root/repo python tools/r4_dev256.py [side]
"""
from __future__ import annotations

import os
import sys
import time

os.environ["TPUSOLVE_SETUP_LOG"] = "1"

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main() -> int:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from tpusolve.mesh import make_mesh
    from tpusolve.stencil import laplace27
    from tpusolve.config import BoomerAMGConfig
    from tpusolve.amg.builder import boomeramg_setup
    from tpusolve.runtime import enable_compile_cache
    enable_compile_cache()

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    A, b, _ = laplace27(mesh, side, side, side, dtype=np.float32)
    jax.block_until_ready(A.dia_vals)
    print(f"gen: {time.perf_counter() - t0:.1f}s n={A.shape[0]} "
          f"nnz={A.nnz}", flush=True)

    for run in ("cold", "warm"):
        print(f"--- {run} ---", flush=True)
        t0 = time.perf_counter()
        pre = boomeramg_setup(A, BoomerAMGConfig())
        dt = time.perf_counter() - t0
        print(f"SETUP{side}_{run}: {dt:.1f}s levels={pre.num_levels}",
              flush=True)
        if run == "cold":
            for i, L in enumerate(pre.levels):
                print(f"  L{i}: n={L.n} nnz={L.nnz}")
        del pre
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
