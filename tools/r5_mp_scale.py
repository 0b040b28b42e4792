"""Round-5 probe (VERDICT r4 next-#4): compile-proof the SPMD multi-part
generic-ELL device AMG setup at >=1M rows BEFORE the north-star config
needs it.

Runs device_level0_ell_mp-backed boomeramg_setup on a scrambled 27-pt
operator (~1.06M rows, no recoverable offset structure) over an 8-device
virtual CPU mesh, COLD then WARM in one process, with per-phase logs —
the cold-warm delta per phase is that phase's XLA trace+compile cost.
The graph is shape-static (fori_loop chunking, while_loop PMIS), so op
count — what remote-TPU compile cost scales with — is size-independent;
this run proves no phase's graph blows up at scale.

    python tools/r5_mp_scale.py [side] [interp]
"""
from __future__ import annotations

import os
import sys
import time

os.environ["TPUSOLVE_SETUP_LOG"] = "1"
os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def scrambled27(side: int, seed: int = 0) -> sp.csr_matrix:
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(side, side))
    A = sp.kronsum(sp.kronsum(lap1, lap1), lap1, format="csr")
    n = A.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    Pm = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
    M = (Pm @ A @ Pm.T).tocsr()
    M.sort_indices()
    return M


def main() -> int:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 102
    interp = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from tpusolve.mesh import make_mesh
    from tpusolve.config import BoomerAMGConfig
    from tpusolve.amg.builder import boomeramg_setup
    from tpusolve.amg import device_setup_ell
    from tpusolve.matrix.sharded import ShardedMatrix

    t0 = time.perf_counter()
    Ah = scrambled27(side)
    print(f"host build: {time.perf_counter() - t0:.1f}s "
          f"n={Ah.shape[0]} nnz={Ah.nnz}", flush=True)
    mesh = make_mesh(8)
    t0 = time.perf_counter()
    A = ShardedMatrix.from_csr_host(mesh, Ah, dtype=np.float32,
                                    allow_dia=False, allow_bell=False,
                                    allow_bdia=False)
    print(f"shard+stage: {time.perf_counter() - t0:.1f}s "
          f"nparts={A.nparts}", flush=True)
    cfg = BoomerAMGConfig(interp_type=interp, max_coarse_size=512,
                          max_levels=4)
    assert device_setup_ell.eligible(A, cfg, Ah)
    for run in ("cold", "warm"):
        print(f"--- {run} (interp {interp}) ---", flush=True)
        t0 = time.perf_counter()
        pre = boomeramg_setup(A, cfg, A_host=Ah)
        dt = time.perf_counter() - t0
        print(f"MP{side}^3_{run}: {dt:.1f}s levels={pre.num_levels}",
              flush=True)
        if run == "cold":
            for i, L in enumerate(pre.levels):
                print(f"  L{i}: n={L.n} nnz={L.nnz}")
        del pre
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
