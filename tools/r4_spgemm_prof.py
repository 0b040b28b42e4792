"""Microbench the _chunked_product internals at 256^3-L1 shapes (A@P:
n=1.36M rows, K=40, Kb=9) to find where the 19.4 s warm goes: the B-row
gather, the segment sort, or the scatter-add pack.  TPU only:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/r4_spgemm_prof.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusolve.amg.device_setup_ell import (
    _expand_sorted_jit, _pack_runs, _run_stats)


def timeit(fn, *a, n=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    C, K, Kb, nB = 186_000, 40, 9, 135_000  # one L1 A@P chunk (~256MB exp)
    sentinel = nB
    Av = jnp.asarray(rng.standard_normal((C, K), dtype=np.float32))
    # ~27/40 slots live, like L1
    Av = Av * (rng.random((C, K)) < 0.67)
    Ac = jnp.asarray(rng.integers(0, nB, (C, K), dtype=np.int32))
    Bv = jnp.asarray(rng.standard_normal((nB, Kb), dtype=np.float32))
    Bc = jnp.asarray(rng.integers(0, nB, (nB, Kb), dtype=np.int32))

    # full expand+sort (gather + mult + sort fused in one jit)
    t_exp = timeit(lambda: _expand_sorted_jit(Av, Ac, Bv, Bc,
                                              sentinel=sentinel))
    tv, tc = _expand_sorted_jit(Av, Ac, Bv, Bc, sentinel=sentinel)

    # gather-only (what does Bv[Ac] cost alone?)
    gat = jax.jit(lambda Ac, Bv, Bc: (Bv[Ac], Bc[Ac]))
    t_gat = timeit(lambda: gat(Ac, Bv, Bc))

    # sort-only at expansion shape
    srt = jax.jit(lambda c, v: jax.lax.sort((c, v), dimension=1,
                                            num_keys=1))
    flat_c = tc  # already (C, K*Kb)
    flat_v = tv
    t_srt = timeit(lambda: srt(flat_c, flat_v))

    # pack (scatter-add dedup) at PACK_W
    t_pack = timeit(lambda: _pack_runs(flat_v, flat_c, jnp.int32(sentinel),
                                       Kout=128))
    t_stats = timeit(lambda: _run_stats(flat_c, sentinel=sentinel))

    print(f"chunk C={C} M={K*Kb} ({C*K*Kb/1e6:.0f}M elements)")
    print(f"  expand+sort jit : {t_exp*1e3:8.1f} ms")
    print(f"  gather B only   : {t_gat*1e3:8.1f} ms")
    print(f"  sort only       : {t_srt*1e3:8.1f} ms")
    print(f"  pack scatter-add: {t_pack*1e3:8.1f} ms")
    print(f"  run stats       : {t_stats*1e3:8.1f} ms")
    nch = 1_360_000 // C + 1
    print(f"  x{nch} chunks -> expand {t_exp*nch:.1f}s pack {t_pack*nch:.1f}s")


if __name__ == "__main__":
    main()
