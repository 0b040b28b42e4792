"""Round-3 TPU measurement runbook — one command, sequential (1 core):

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/r3_measure.py

Runs, in order, on the real TPU:
  1. 256^3 (16.8M-row) device AMG setup probe with phase logs
  2. bench.py            -> BENCH one-liner (driver metric)
  3. bench.py --full     -> BENCH_FULL.json (BDIA-XL, flagship, 128^3 and
                            256^3 setups, gate-3/4 CLI runs)
  4. tools/parity.py --tpu --write-readme  -> README parity table incl.
                            the 2.1M-row TPU-only fixture

Each step's stdout/stderr goes to tools/logs/r3_<step>.log; a summary is
printed at the end.  Never run concurrently with anything else: timings
inflate 3-100x on the 1-core build VM.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "tools", "logs")

DEV256 = """
import os, time
os.environ["TPUSOLVE_SETUP_LOG"] = "1"
import numpy as np, jax
from tpusolve.mesh import make_mesh
from tpusolve.stencil import laplace27
from tpusolve.config import BoomerAMGConfig
from tpusolve.amg.builder import boomeramg_setup
from tpusolve.runtime import enable_compile_cache
enable_compile_cache()
mesh = make_mesh(1)
t0 = time.perf_counter()
A, b, _ = laplace27(mesh, 256, 256, 256, dtype=np.float32)
jax.block_until_ready(A.dia_vals)
print(f"gen: {time.perf_counter()-t0:.1f}s n={A.shape[0]} nnz={A.nnz}",
      flush=True)
t0 = time.perf_counter()
pre = boomeramg_setup(A, BoomerAMGConfig())
print(f"SETUP256: {time.perf_counter()-t0:.1f}s levels={pre.num_levels}",
      flush=True)
for i, L in enumerate(pre.levels):
    print(f"  L{i}: n={L.n} nnz={L.nnz}")
"""


def run(name: str, argv, timeout=3000, code=None) -> int:
    os.makedirs(LOGS, exist_ok=True)
    log = os.path.join(LOGS, f"r3_{name}.log")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    with open(log, "w") as fh:
        if code is not None:
            p = subprocess.run([sys.executable, "-u", "-c", code],
                               stdout=fh, stderr=subprocess.STDOUT,
                               env=env, cwd=REPO, timeout=timeout)
        else:
            p = subprocess.run([sys.executable, "-u"] + argv,
                               stdout=fh, stderr=subprocess.STDOUT,
                               env=env, cwd=REPO, timeout=timeout)
    dt = time.perf_counter() - t0
    print(f"[{name}] rc={p.returncode} {dt:.0f}s -> {log}", flush=True)
    tail = open(log).read().splitlines()[-8:]
    for ln in tail:
        print(f"    {ln}")
    return p.returncode


def main() -> int:
    rc = 0
    rc |= run("dev256", None, timeout=3000, code=DEV256)
    rc |= run("bench", ["bench.py"], timeout=1800)
    rc |= run("bench_full", ["bench.py", "--full"], timeout=5400)
    rc |= run("parity_tpu",
              ["tools/parity.py", "--tpu", "--write-readme"], timeout=3600)
    print("ALL DONE rc:", rc)
    return rc


if __name__ == "__main__":
    sys.exit(main())
