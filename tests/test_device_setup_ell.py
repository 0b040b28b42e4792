"""Generic-ELL device AMG setup (amg/device_setup_ell.py) vs the host
pipeline.

The device path mirrors the host algorithms exactly (same formulas, same
seeded PMIS tie-breaks), so hierarchies must match: identical C/F splits
and P entries, coarse operators equal to accumulation-order roundoff.
This is the unstructured analog of tests/test_device_setup.py — the
operators here are scrambled lattices with NO usable offset structure
(the reference's file-loaded systems, src/HypreSystem.cpp:1613-1969).
"""

import dataclasses
import os

import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.amg import device_setup_ell
from tpusolve.amg.builder import boomeramg_setup
from tpusolve.config import BoomerAMGConfig
from tpusolve.matrix.sharded import ShardedMatrix


def _tosp(M):
    return M.to_scipy().tocsr() if hasattr(M, "to_scipy") else sp.csr_matrix(M)


def scrambled_laplace(n_side: int, seed: int = 0) -> sp.csr_matrix:
    """2-D 5-point Laplacian under a random symmetric permutation: SPD,
    bounded row width, no recoverable diagonal structure."""
    n = n_side * n_side
    L1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n_side, n_side))
    A2 = sp.kronsum(L1, L1, format="csr")
    perm = np.random.default_rng(seed).permutation(n)
    Pm = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
    A = (Pm @ A2 @ Pm.T).tocsr()
    A.sort_indices()
    return A


def _build(mesh, Ah):
    return ShardedMatrix.from_csr_host(mesh, Ah, dtype=np.float64,
                                       allow_bell=False, allow_bdia=False)


def _setup_pair(mesh, Ah, cfg):
    A = _build(mesh, Ah)
    os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
    try:
        assert device_setup_ell.eligible(A, cfg, Ah), \
            "ELL device path must be eligible"
        pre_dev = boomeramg_setup(A, cfg, A_host=Ah)
        assert any("generic ELL" in n for n in pre_dev.notes)
        os.environ["TPUSOLVE_HOST_SETUP"] = "1"
        try:
            pre_host = boomeramg_setup(A, cfg, A_host=Ah)
        finally:
            del os.environ["TPUSOLVE_HOST_SETUP"]
    finally:
        del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
    return A, pre_dev, pre_host


class TestHierarchyParity:
    @pytest.mark.slow
    def test_identical_hierarchy(self, mesh1):
        cfg = BoomerAMGConfig(interp_type=3, max_coarse_size=64)
        Ah = scrambled_laplace(44)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        # with MIN_N=1 every level above max_coarse_size recurses on
        # device (builder's generic-ELL recursion) — parity must hold at
        # EVERY level, not just the fine one
        assert any("recursed on device" in n for n in pre_dev.notes)
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for lvl, (d, h) in enumerate(zip(ld, lh)):
            assert d.n == h.n
            if lvl > 0:
                A_d, A_h = _tosp(d.A), _tosp(h.A)
                dd = abs(A_d - A_h)
                assert (dd.max() if dd.nnz else 0.0) < 1e-10
            if d.P is not None:
                P_d, P_h = _tosp(d.P), _tosp(h.P)
                assert P_d.shape == P_h.shape
                dP = abs(P_d - P_h)
                assert (dP.max() if dP.nnz else 0.0) < 1e-11
                # restriction is P^T (vs the device P it was built from)
                dR = abs(_tosp(d.R) - P_d.T.tocsr())
                assert (dR.max() if dR.nnz else 0.0) == 0.0

    @pytest.mark.slow
    def test_solve_convergence_matches(self, mesh1):
        from tpusolve.krylov.cg import pcg_setup
        from tpusolve.matrix.vectors import to_device_vector
        cfg = BoomerAMGConfig(interp_type=3, max_coarse_size=64)
        Ah = scrambled_laplace(40, seed=3)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        rng = np.random.default_rng(0)
        b = to_device_vector(A.mesh, rng.standard_normal(A.shape[0]),
                             np.asarray(A.row_offsets), A.row_pad,
                             dtype=np.float64)
        rd = pcg_setup(A, pre_dev.apply, tol=1e-8, maxiter=80)(b)
        rh = pcg_setup(A, pre_host.apply, tol=1e-8, maxiter=80)(b)
        assert bool(rd.converged) and bool(rh.converged)
        assert int(rd.iters) == int(rh.iters)

    def test_staged_host_csr_equals_real_ell(self, mesh1):
        """The host-CSR staging branch (used when the solve layout is
        BDIA/BELL/DIA) must feed the pipeline the same operator as the
        real ELL diag layout."""
        Ah = scrambled_laplace(24, seed=7)
        A = _build(mesh1, Ah)
        v1, c1 = device_setup_ell._stage_ell(A, None)
        # impersonate a BDIA-layout matrix (dummy diag_vals): forces the
        # host-CSR pack branch
        A2 = dataclasses.replace(A, bdia_vals=A.diag_vals,
                                 bdia_starts=A.diag_cols)
        v2, c2 = device_setup_ell._stage_ell(A2, Ah)

        def todense(v, c):
            v = np.asarray(v)
            c = np.asarray(c)
            n = Ah.shape[0]
            out = np.zeros((v.shape[0], n))
            rows = np.repeat(np.arange(v.shape[0]), v.shape[1])
            # np.add.at: padding slots (col 0, val 0) may collide with a
            # real col-0 entry — fancy += would drop one of them
            np.add.at(out, (rows, c.reshape(-1)), v.reshape(-1))
            return out[:n]

        np.testing.assert_allclose(todense(v1, c1), todense(v2, c2),
                                   rtol=0, atol=0)

    def test_eligibility_gates(self, mesh1, mesh8):
        Ah = scrambled_laplace(24)
        A = _build(mesh1, Ah)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        try:
            ok = BoomerAMGConfig(interp_type=3)
            assert device_setup_ell.eligible(A, ok, Ah)
            # classical interpolation (distance-2): chunked device path
            assert device_setup_ell.eligible(
                A, BoomerAMGConfig(interp_type=0), Ah)
            # extended+i (gate-3 pressure config): single-part device path
            assert device_setup_ell.eligible(
                A, BoomerAMGConfig(interp_type=6), Ah)
            # multipass stays on the host pipeline
            assert not device_setup_ell.eligible(
                A, BoomerAMGConfig(interp_type=4), Ah)
            # aggressive coarsening: host pipeline
            assert not device_setup_ell.eligible(
                A, BoomerAMGConfig(interp_type=3, agg_num_levels=1), Ah)
            # truncation: host pipeline
            assert not device_setup_ell.eligible(
                A, BoomerAMGConfig(interp_type=3, trunc_factor=0.2), Ah)
            # multi-part operators route to the SPMD pipeline (direct,
            # classical-modified AND extended+i interpolation)
            A8 = ShardedMatrix.from_csr_host(mesh8, scrambled_laplace(32),
                                             dtype=np.float64,
                                             allow_bell=False,
                                             allow_bdia=False)
            assert device_setup_ell.eligible(A8, ok, None)
            assert device_setup_ell.eligible(
                A8, BoomerAMGConfig(interp_type=0), None)
            assert device_setup_ell.eligible(
                A8, BoomerAMGConfig(interp_type=6), None)
            assert not device_setup_ell.eligible(
                A8, BoomerAMGConfig(interp_type=4), None)
        finally:
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]

    @pytest.mark.slow
    def test_classical_interp_hierarchy(self, mesh1):
        """interp_type 0 (classical modified, distance-2) on the device
        path must reproduce the host hierarchy to roundoff at EVERY level
        (the default interpolation — what the reference runs with no
        interp_type key, src/HypreSystem.cpp:192-194)."""
        cfg = BoomerAMGConfig(interp_type=0, max_coarse_size=64)
        Ah = scrambled_laplace(44, seed=1)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        assert any("recursed on device" in n for n in pre_dev.notes)
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for lvl, (d, h) in enumerate(zip(ld, lh)):
            assert d.n == h.n
            if lvl > 0:
                dd = abs(_tosp(d.A) - _tosp(h.A))
                assert (dd.max() if dd.nnz else 0.0) < 1e-10
            if d.P is not None:
                P_d, P_h = _tosp(d.P), _tosp(h.P)
                assert P_d.shape == P_h.shape
                dP = abs(P_d - P_h)
                assert (dP.max() if dP.nnz else 0.0) < 1e-11
                dR = abs(_tosp(d.R) - P_d.T.tocsr())
                assert (dR.max() if dR.nnz else 0.0) == 0.0

    @pytest.mark.slow
    @pytest.mark.parametrize("n_side,interp", [(40, 3), (43, 3), (40, 0),
                                               (43, 0), (40, 6), (43, 6)])
    def test_multipart_hierarchy_parity(self, mesh8, n_side, interp):
        """SPMD multi-part setup (amg/device_setup_ell_mp.py) on an
        8-device mesh: hierarchies must equal the host pipeline's to
        roundoff at EVERY level (fine level via the sharded pipeline,
        coarse levels via its device recursion) — for uniform (40^2) and
        remainder (43^2) row decompositions.  This is the north-star
        path: distributed device BoomerAMGSetup on an arbitrary
        unstructured operator (ref: src/HypreSystem.cpp:692 on the
        file-loaded systems of :1021-1318, 1613-1969).  interp 3 (direct)
        and 0 (classical modified — the reference default) both run the
        SPMD pipeline."""
        cfg = BoomerAMGConfig(interp_type=interp, max_coarse_size=64)
        Ah = scrambled_laplace(n_side)
        A = ShardedMatrix.from_csr_host(mesh8, Ah, dtype=np.float64,
                                        allow_bell=False, allow_bdia=False)
        os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"] = "1"
        try:
            assert device_setup_ell.eligible(A, cfg, Ah)
            pre_dev = boomeramg_setup(A, cfg, A_host=Ah)
            assert any("generic ELL" in n for n in pre_dev.notes)
            os.environ["TPUSOLVE_HOST_SETUP"] = "1"
            try:
                pre_host = boomeramg_setup(A, cfg, A_host=Ah)
            finally:
                del os.environ["TPUSOLVE_HOST_SETUP"]
        finally:
            del os.environ["TPUSOLVE_DEVICE_SETUP_MIN_N"]
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for lvl, (d, h) in enumerate(zip(ld, lh)):
            assert d.n == h.n
            if lvl > 0:
                dd = abs(_tosp(d.A) - _tosp(h.A))
                assert (dd.max() if dd.nnz else 0.0) < 1e-10
            if d.P is not None:
                P_d, P_h = _tosp(d.P), _tosp(h.P)
                assert P_d.shape == P_h.shape and P_d.nnz == P_h.nnz
                dP = abs(P_d - P_h)
                assert (dP.max() if dP.nnz else 0.0) < 1e-11
                dR = abs(_tosp(d.R) - P_d.T.tocsr())
                assert (dR.max() if dR.nnz else 0.0) == 0.0
        # solve parity
        from tpusolve.krylov.cg import pcg_setup
        from tpusolve.matrix.vectors import to_device_vector
        rng = np.random.default_rng(0)
        b = to_device_vector(A.mesh, rng.standard_normal(A.shape[0]),
                             np.asarray(A.row_offsets), A.row_pad,
                             dtype=np.float64)
        rd = pcg_setup(A, pre_dev.apply, tol=1e-8, maxiter=80)(b)
        rh = pcg_setup(A, pre_host.apply, tol=1e-8, maxiter=80)(b)
        assert bool(rd.converged) and bool(rh.converged)
        assert int(rd.iters) == int(rh.iters)

    @pytest.mark.slow
    def test_classical_interp_lump_and_sign_branches(self, mesh1):
        """Classical interp's hat-entry sign filter and the d_ik == 0
        diagonal lumping, on an operator with positive off-diagonals and
        identity rows."""
        Ah = scrambled_laplace(30, seed=13).tolil()
        rng = np.random.default_rng(6)
        for i in rng.integers(0, Ah.shape[0], size=10):
            Ah.rows[i] = [int(i)]
            Ah.data[i] = [1.0]
        Ah = Ah.tocsr()
        Ah = (Ah + sp.random(Ah.shape[0], Ah.shape[0], density=1e-3,
                             random_state=3, data_rvs=lambda k: 0.15 *
                             np.ones(k))).tocsr()
        Ah = (Ah + Ah.T).tocsr() * 0.5
        Ah.sort_indices()
        cfg = BoomerAMGConfig(interp_type=0, max_coarse_size=32)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        P_d, P_h = _tosp(pre_dev.levels[0].P), _tosp(pre_host.levels[0].P)
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12
        d = abs(_tosp(pre_dev.levels[1].A) - _tosp(pre_host.levels[1].A))
        assert (d.max() if d.nnz else 0.0) < 1e-10

    @pytest.mark.slow
    def test_dirichlet_rows_and_positive_offdiag(self, mesh1):
        """Rows with no strong neighbors (Dirichlet identity rows) and
        positive off-diagonals exercise the alpha/beta/lump branches."""
        Ah = scrambled_laplace(30, seed=11).tolil()
        rng = np.random.default_rng(5)
        # a few identity rows
        for i in rng.integers(0, Ah.shape[0], size=12):
            Ah.rows[i] = [int(i)]
            Ah.data[i] = [1.0]
        Ah = Ah.tocsr()
        # sprinkle positive off-diagonal couplings (keep diagonal dominant)
        Ah = (Ah + sp.random(Ah.shape[0], Ah.shape[0], density=5e-4,
                             random_state=9, data_rvs=lambda k: 0.1 *
                             np.ones(k))).tocsr()
        Ah = (Ah + Ah.T).tocsr() * 0.5
        Ah.sort_indices()
        cfg = BoomerAMGConfig(interp_type=3, max_coarse_size=32)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        P_d, P_h = _tosp(pre_dev.levels[0].P), _tosp(pre_host.levels[0].P)
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12
        A1_d, A1_h = _tosp(pre_dev.levels[1].A), _tosp(pre_host.levels[1].A)
        d = abs(A1_d - A1_h)
        assert (d.max() if d.nnz else 0.0) < 1e-10



    @pytest.mark.slow
    def test_exti_interp_hierarchy(self, mesh1):
        """interp_type 6 (extended+i, distance-2 extended pattern) on the
        device path must reproduce the host hierarchy to roundoff at
        EVERY level - the gate-3 pressure config (tools/gatefix.py; ref
        src/HypreSystem.cpp:205-216)."""
        cfg = BoomerAMGConfig(interp_type=6, max_coarse_size=64)
        Ah = scrambled_laplace(44, seed=2)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        assert any("recursed on device" in n for n in pre_dev.notes)
        ld, lh = pre_dev.levels, pre_host.levels
        assert len(ld) == len(lh)
        for lvl, (d, h) in enumerate(zip(ld, lh)):
            assert d.n == h.n
            if lvl > 0:
                dd = abs(_tosp(d.A) - _tosp(h.A))
                assert (dd.max() if dd.nnz else 0.0) < 1e-10
            if d.P is not None:
                P_d, P_h = _tosp(d.P), _tosp(h.P)
                assert P_d.shape == P_h.shape
                dP = abs(P_d - P_h)
                assert (dP.max() if dP.nnz else 0.0) < 1e-11

    def test_exti_interp_small_fixture(self, mesh1):
        """Fast ext+i parity leg (stays in the not-slow tier): P and the
        first coarse operator match the host on a small scrambled
        operator with positive couplings and identity rows."""
        Ah = scrambled_laplace(26, seed=9).tolil()
        rng = np.random.default_rng(4)
        for i in rng.integers(0, Ah.shape[0], size=8):
            Ah.rows[i] = [int(i)]
            Ah.data[i] = [1.0]
        Ah = Ah.tocsr()
        Ah = (Ah + sp.random(Ah.shape[0], Ah.shape[0], density=8e-4,
                             random_state=2, data_rvs=lambda k: 0.12 *
                             np.ones(k))).tocsr()
        Ah = (Ah + Ah.T).tocsr() * 0.5
        Ah.sort_indices()
        cfg = BoomerAMGConfig(interp_type=6, max_coarse_size=32)
        A, pre_dev, pre_host = _setup_pair(mesh1, Ah, cfg)
        P_d, P_h = _tosp(pre_dev.levels[0].P), _tosp(pre_host.levels[0].P)
        assert P_d.shape == P_h.shape and P_d.nnz == P_h.nnz
        dP = abs(P_d - P_h)
        assert (dP.max() if dP.nnz else 0.0) < 1e-12
        d = abs(_tosp(pre_dev.levels[1].A) - _tosp(pre_host.levels[1].A))
        assert (d.max() if d.nnz else 0.0) < 1e-10


class TestPackHelpers:
    """Unit tests for the scatter-free pack kernels (ADVICE r4)."""

    def test_pack_runs_high_contrast(self):
        """Segment sums must not inherit error from preceding runs: a
        1e6-contrast prefix in the same row previously left ~2.0 abs
        error on small late runs (cumsum-differencing); the segmented
        scan keeps them to float32 roundoff."""
        import jax.numpy as jnp
        M, sent = 512, 2**31 - 1
        rng = np.random.default_rng(3)
        # one row: a huge first run, then many tiny runs
        cols = np.sort(rng.integers(0, 64, size=M)).astype(np.int32)
        vals = rng.standard_normal(M).astype(np.float32) * 1e-3
        vals[cols == cols[0]] += 1e6          # high-contrast leading run
        ref = {}
        for c, v in zip(cols, vals):
            ref[int(c)] = ref.get(int(c), 0.0) + float(v)
        ov, oc = device_setup_ell._pack_runs(
            jnp.asarray(vals)[None, :], jnp.asarray(cols)[None, :],
            jnp.int32(sent), Kout=64)
        ov, oc = np.asarray(ov[0]), np.asarray(oc[0])
        got = {int(c): float(v) for c, v in zip(oc, ov) if v != 0}
        for c, v in ref.items():
            if abs(v) < 1e-9:
                continue
            assert abs(got.get(c, 0.0) - v) < 1e-2 * max(1.0, abs(v)), \
                (c, got.get(c), v)
        # the small runs specifically: error must be ~1e-6-scale, not ~1
        small = [c for c, v in ref.items() if abs(v) < 1.0 and c != cols[0]]
        err = max(abs(got.get(c, 0.0) - ref[c]) for c in small)
        assert err < 1e-4, err

    def test_pack_sel_widens_when_ksel_exceeds_k(self):
        """Ksel > K must pad (contract of the replaced cursor-scatter
        implementation), not silently clamp to K."""
        import jax.numpy as jnp
        vals = jnp.asarray([[1.0, 0.0, 3.0]], jnp.float32)
        cols = jnp.asarray([[5, 6, 7]], jnp.int32)
        mask = jnp.asarray([[True, False, True]])
        ov, oc, cnt = device_setup_ell._pack_sel_jit(
            vals, cols, mask, Ksel=5, fillcol=9)
        assert ov.shape == (1, 5) and oc.shape == (1, 5)
        np.testing.assert_allclose(np.asarray(ov[0]), [1.0, 3.0, 0, 0, 0])
        assert np.asarray(oc[0]).tolist() == [5, 7, 9, 9, 9]
        assert int(cnt[0]) == 2
