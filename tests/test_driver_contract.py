"""Driver-contract tests: bench.py emits one valid JSON line; the graft
entry points compile and run on the virtual multi-device mesh."""

import importlib.util
import json
import subprocess
import sys

import numpy as np
import pytest
import jax


def test_bench_emits_one_json_line():
    # run in-process on the CPU mesh (fresh subprocess would re-init jax)
    import io
    import contextlib
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench.main()
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print exactly one line: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["unit"] == "GB/s"


def test_graft_entry_and_dryrun():
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    # multi-chip dry run on the 8-device virtual mesh
    graft.dryrun_multichip(8)
    # single-chip jittable forward step
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    x, iters, relres = out
    assert int(iters) > 0
    assert float(relres) < 1e-5
