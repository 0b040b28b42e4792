"""Quick driver: multi-part generic-ELL device setup vs host pipeline."""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.environ.setdefault("TPUSOLVE_PMIS_HOST_RANK", "1")
os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402
from tpusolve.mesh import make_mesh  # noqa: E402
from tpusolve.matrix.sharded import ShardedMatrix  # noqa: E402
from tpusolve.amg import device_setup_ell  # noqa: E402
from tpusolve.amg.builder import boomeramg_setup  # noqa: E402
from tpusolve.config import BoomerAMGConfig  # noqa: E402
from test_device_setup_ell import scrambled_laplace  # noqa: E402


def tosp(M):
    return M.to_scipy().tocsr()


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    mesh = make_mesh(8)
    Ah = scrambled_laplace(n_side)
    A = ShardedMatrix.from_csr_host(mesh, Ah, dtype=np.float64,
                                    allow_bell=False, allow_bdia=False)
    cfg = BoomerAMGConfig(interp_type=3, max_coarse_size=64)
    assert device_setup_ell.eligible(A, cfg, Ah), "not eligible"
    pre_dev = boomeramg_setup(A, cfg, A_host=Ah)
    print("device notes:", pre_dev.notes)
    os.environ["TPUSOLVE_HOST_SETUP"] = "1"
    try:
        pre_host = boomeramg_setup(A, cfg, A_host=Ah)
    finally:
        del os.environ["TPUSOLVE_HOST_SETUP"]

    ld, lh = pre_dev.levels, pre_host.levels
    print("levels:", len(ld), "vs", len(lh))
    assert len(ld) == len(lh)
    for lvl, (d, h) in enumerate(zip(ld, lh)):
        print(f"  lvl {lvl}: n {d.n}/{h.n} nnz {d.nnz}/{h.nnz}")
        assert d.n == h.n, (lvl, d.n, h.n)
        if lvl > 0:
            dd = abs(tosp(d.A) - tosp(h.A))
            m = dd.max() if dd.nnz else 0.0
            print(f"        dA = {m:.2e}")
            assert m < 1e-10
        if d.P is not None:
            P_d, P_h = tosp(d.P), tosp(h.P)
            dP = abs(P_d - P_h)
            m = dP.max() if dP.nnz else 0.0
            print(f"        dP = {m:.2e}  (nnz {P_d.nnz}/{P_h.nnz})")
            assert m < 1e-11
            dR = abs(tosp(d.R) - P_d.T.tocsr())
            m = dR.max() if dR.nnz else 0.0
            print(f"        dR = {m:.2e}")
            assert m < 1e-12

    # solve parity
    from tpusolve.krylov.cg import pcg_setup
    from tpusolve.matrix.vectors import to_device_vector
    rng = np.random.default_rng(0)
    b = to_device_vector(A.mesh, rng.standard_normal(A.shape[0]),
                         np.asarray(A.row_offsets), A.row_pad,
                         dtype=np.float64)
    rd = pcg_setup(A, pre_dev.apply, tol=1e-8, maxiter=80)(b)
    rh = pcg_setup(A, pre_host.apply, tol=1e-8, maxiter=80)(b)
    print("iters:", int(rd.iters), "vs", int(rh.iters),
          "converged:", bool(rd.converged), bool(rh.converged))
    assert bool(rd.converged) and bool(rh.converged)
    print("MP PARITY OK")


if __name__ == "__main__":
    main()
