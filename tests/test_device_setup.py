"""Device-side level-0 AMG setup (amg/device_setup.py) vs the host pipeline.

The device path mirrors the host algorithms exactly (same formulas, same
seeded PMIS tie-breaks), so hierarchies must match: identical C/F splits
and patterns, P and coarse operators equal to accumulation-order roundoff
(the host pipeline's native kernels, the numpy fallbacks, and the device
plane contractions each sum distance-2 terms in a different order).  The
reference runs its whole setup on device inside HYPRE_BoomerAMGSetup
(src/HypreSystem.cpp:692); here the fine level (the 8x-dominant cost) is
the device stage.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.amg import device_setup
from tpusolve.amg.builder import boomeramg_setup
from tpusolve.config import BoomerAMGConfig
from tpusolve.stencil import laplace27


def _tosp(M):
    return M.to_scipy().tocsr() if hasattr(M, "to_scipy") else sp.csr_matrix(M)


def _setup_pair(mesh, n, cfg):
    """Run boomeramg_setup twice: device fine level vs all-host."""
    A, b, _ = laplace27(mesh, n, n, n, dtype=np.float64)
    os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
    try:
        assert device_setup.eligible(A, cfg), "device path must be eligible"
        pre_dev = boomeramg_setup(A, cfg)
        os.environ["TPUSOLVE_HOST_SETUP"] = "1"
        try:
            pre_host = boomeramg_setup(A, cfg)
        finally:
            del os.environ["TPUSOLVE_HOST_SETUP"]
    finally:
        del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
    return A, b, pre_dev, pre_host


class TestHierarchyParity:
    @pytest.mark.parametrize("interp_type", [0, 3])
    @pytest.mark.slow
    def test_identical_hierarchy(self, mesh1, interp_type):
        cfg = BoomerAMGConfig(max_coarse_size=64, interp_type=interp_type)
        A, b, pre_dev, pre_host = _setup_pair(mesh1, 16, cfg)
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for d, h in zip(ld, lh):
            assert d.n == h.n and d.nnz == h.nnz
        # identical C/F split and pattern; P equal to roundoff
        P_d, P_h = _tosp(ld[0].P), _tosp(lh[0].P)
        assert P_d.nnz == P_h.nnz
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12
        # coarse operator equal to roundoff (different contraction order)
        A1_d, A1_h = _tosp(ld[1].A), _tosp(lh[1].A)
        d = abs(A1_d - A1_h)
        assert (d.max() if d.nnz else 0.0) < 1e-10
        # restriction is P^T (bitwise vs the device P it was built from)
        R_d = _tosp(ld[0].R)
        dR = abs(R_d - P_d.T.tocsr())
        assert (dR.max() if dR.nnz else 0.0) == 0.0

    @pytest.mark.slow
    def test_solve_convergence_matches(self, mesh1):
        from tpusolve.krylov.cg import pcg_setup
        cfg = BoomerAMGConfig(max_coarse_size=64)
        A, b, pre_dev, pre_host = _setup_pair(mesh1, 16, cfg)
        rd = pcg_setup(A, pre_dev.apply, tol=1e-8, maxiter=60)(b)
        rh = pcg_setup(A, pre_host.apply, tol=1e-8, maxiter=60)(b)
        assert bool(rd.converged) and bool(rh.converged)
        assert int(rd.iters) == int(rh.iters)

    @pytest.mark.slow
    def test_staged_interp_matches_fused(self, mesh1):
        """The memory-bounded staged classical interp (big grids) must
        produce the same hierarchy as the fused single-jit formulation."""
        cfg = BoomerAMGConfig(max_coarse_size=64, interp_type=0)
        os.environ["TPUSOLVE_INTERP_STAGED_MIN_BYTES"] = "1"
        try:
            A, b, pre_dev, pre_host = _setup_pair(mesh1, 12, cfg)
        finally:
            del os.environ["TPUSOLVE_INTERP_STAGED_MIN_BYTES"]
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for d, h in zip(ld, lh):
            assert d.n == h.n and d.nnz == h.nnz
        P_d, P_h = _tosp(ld[0].P), _tosp(lh[0].P)
        assert P_d.nnz == P_h.nnz
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12

    def test_ineligible_configs_fall_back(self, mesh1):
        A, b, _ = laplace27(mesh1, 8, 8, 8, dtype=np.float64)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        try:
            # aggressive coarsening is host-only
            assert not device_setup.eligible(
                A, BoomerAMGConfig(agg_num_levels=1))
            # truncation is host-only
            assert not device_setup.eligible(
                A, BoomerAMGConfig(trunc_factor=0.2))
            # serial RS coarsening needs the host pass
            assert not device_setup.eligible(
                A, BoomerAMGConfig(coarsen_type=6))
            pre = boomeramg_setup(A, BoomerAMGConfig(coarsen_type=6,
                                                     max_coarse_size=32))
            assert pre.num_levels >= 2
        finally:
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]

    def test_host_setup_env_override(self, mesh1):
        A, _, _ = laplace27(mesh1, 8, 8, 8, dtype=np.float64)
        os.environ["TPUSOLVE_HOST_SETUP"] = "1"
        try:
            assert not device_setup.eligible(A, BoomerAMGConfig())
        finally:
            del os.environ["TPUSOLVE_HOST_SETUP"]

    @pytest.mark.slow
    def test_symmetric_rap_matches_full_scan(self, mesh1):
        """Production mode halves the RAP term table via Galerkin symmetry
        (device_setup._gather_mirror).  The mirrored planes must agree
        with the full scan to roundoff (they differ only in summation
        order / explicit-zero bookkeeping)."""
        cfg = BoomerAMGConfig(max_coarse_size=64, interp_type=0,
                              max_levels=2)
        A, b, _ = laplace27(mesh1, 16, 16, 16, dtype=np.float64)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "0"
        acs = {}
        nnzs = {}
        try:
            for sym in ("1", "0"):
                os.environ["TPUSOLVE_RAP_SYM"] = sym
                pre = boomeramg_setup(A, cfg)
                acs[sym] = _tosp(pre.levels[1].A)
                nnzs[sym] = pre.levels[1].nnz
        finally:
            os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "1"
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
            del os.environ["TPUSOLVE_RAP_SYM"]
        assert acs["1"].shape == acs["0"].shape
        d = abs(acs["1"] - acs["0"])
        assert (d.max() if d.nnz else 0.0) < 1e-10
        # nnz METADATA must agree too, modulo the documented
        # explicit-zero-twin difference (sym keeps both twins of entries
        # whose direct sum cancels to exact 0.0; it may never EXCEED the
        # full scan by more — a tail-chunk spill into the mirrored planes
        # double-counts and inflates nnz_c/Kc, ADVICE r3 medium)
        assert nnzs["0"] <= nnzs["1"] <= nnzs["0"] + max(
            8, nnzs["0"] // 1000), nnzs

    @pytest.mark.slow
    @pytest.mark.parametrize("interp_type,cycle", [(0, 1), (3, 1), (0, 2)])
    def test_production_defaults_converge(self, mesh1, interp_type, cycle):
        """Coverage leg for the PRODUCTION configuration (ADVICE r3 low):
        device-generated PMIS ranks + symmetric-RAP halving, which the
        suite's global TPUSOLVE_PMIS_HOST_RANK=1 pin otherwise bypasses.
        Parity-insensitive check: multilevel hierarchies under several
        interp/cycle configs must still solve Laplace at host-grade rates."""
        from tpusolve.krylov.cg import pcg_setup
        cfg = BoomerAMGConfig(max_coarse_size=32, interp_type=interp_type,
                              cycle_type=cycle)
        A, b, _ = laplace27(mesh1, 12, 12, 12, dtype=np.float64)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "0"
        try:
            assert not device_setup.use_host_rank()
            pre = boomeramg_setup(A, cfg)
        finally:
            os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "1"
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
        assert pre.num_levels >= 3
        r = pcg_setup(A, pre.apply, tol=1e-8, maxiter=60)(b)
        assert bool(r.converged) and int(r.iters) <= 15

    @pytest.mark.slow
    def test_device_rank_mode_converges(self, mesh1):
        """Production default (device-generated PMIS tie-break permutation,
        TPUSOLVE_PMIS_HOST_RANK unset): the hierarchy differs from the
        host's in its C/F tie-breaks but must solve just as well."""
        from tpusolve.krylov.cg import pcg_setup
        cfg = BoomerAMGConfig(max_coarse_size=64)
        A, b, _ = laplace27(mesh1, 16, 16, 16, dtype=np.float64)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "0"
        try:
            assert not device_setup.use_host_rank()
            pre = boomeramg_setup(A, cfg)
        finally:
            os.environ["TPUSOLVE_PMIS_HOST_RANK"] = "1"
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
        assert pre.num_levels >= 2
        r = pcg_setup(A, pre.apply, tol=1e-8, maxiter=60)(b)
        assert bool(r.converged) and int(r.iters) <= 15


@pytest.mark.slow
class TestShardedDeviceSetup:
    """Multi-part (sharded) device setup (amg/device_setup_sharded.py) vs
    the all-host pipeline on the same global operator."""

    def _pair(self, mesh8, pgrid, interp_type, n=8):
        from tpusolve.amg import device_setup_sharded as dss
        cfg = BoomerAMGConfig(max_coarse_size=64, interp_type=interp_type)
        A, b, _, lat = laplace27(mesh8, n, n, n, dtype=np.float64,
                                 pgrid=pgrid, with_lattice=True)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        try:
            assert dss.eligible(A, cfg, lat)
            pre_dev = boomeramg_setup(A, cfg, lattice_parts=lat)
            os.environ["TPUSOLVE_HOST_SETUP"] = "1"
            try:
                pre_host = boomeramg_setup(A, cfg)
            finally:
                del os.environ["TPUSOLVE_HOST_SETUP"]
        finally:
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
        return A, b, pre_dev, pre_host

    @pytest.mark.parametrize("pgrid", [(1, 1, 8), (2, 2, 2)])
    @pytest.mark.parametrize("interp_type", [0, 3])
    def test_hierarchy_matches_host(self, mesh8, pgrid, interp_type):
        A, b, pre_dev, pre_host = self._pair(mesh8, pgrid, interp_type)
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for d, h in zip(ld, lh):
            assert d.n == h.n and d.nnz == h.nnz
        P_d, P_h = _tosp(ld[0].P), _tosp(lh[0].P)
        assert P_d.nnz == P_h.nnz
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12
        A1_d, A1_h = _tosp(ld[1].A), _tosp(lh[1].A)
        d = abs(A1_d - A1_h)
        assert (d.max() if d.nnz else 0.0) < 1e-10
        R_d = _tosp(ld[0].R)
        dR = abs(R_d - P_d.T.tocsr())
        assert (dR.max() if dR.nnz else 0.0) == 0.0

    def test_solve_matches_host(self, mesh8):
        from tpusolve.krylov.cg import pcg_setup
        A, b, pre_dev, pre_host = self._pair(mesh8, (2, 2, 2), 0)
        rd = pcg_setup(A, pre_dev.apply, tol=1e-8, maxiter=60)(b)
        rh = pcg_setup(A, pre_host.apply, tol=1e-8, maxiter=60)(b)
        assert bool(rd.converged) and bool(rh.converged)
        assert int(rd.iters) == int(rh.iters)
