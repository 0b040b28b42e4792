import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.ilu.ilu import chow_patel_ilu, ilu_setup, _fill_pattern
from tpusolve.config import ILUConfig
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.vectors import to_device_vector, from_device_vector
from tpusolve.krylov import gmres_setup, bicgstab_setup
from tests.test_amg import laplace_2d


def nonsym(n, rng):
    main = 4.0 * np.ones(n)
    lower = -1.5 * np.ones(n - 1)
    upper = -0.5 * np.ones(n - 1)
    A = sp.diags([lower, main, upper], [-1, 0, 1]).tocsr()
    return A


class TestChowPatel:
    def test_ilu0_exact_on_tridiagonal(self, rng):
        # tridiagonal has no fill, so ILU(0) == exact LU
        A = nonsym(20, rng)
        L, ujj, U = chow_patel_ilu(A, sweeps=30)
        Lfull = sp.eye(20) + L
        Ufull = sp.diags(ujj) + U
        np.testing.assert_allclose((Lfull @ Ufull).toarray(), A.toarray(),
                                   rtol=1e-10, atol=1e-12)

    def test_ilu0_pattern_preserved(self):
        A = laplace_2d(6, 6)
        L, ujj, U = chow_patel_ilu(A, sweeps=5)
        # L and U live on A's pattern
        pat = set(zip(*A.nonzero()))
        for M in (L, U):
            for i, j in zip(*M.nonzero()):
                assert (i, j) in pat

    def test_residual_small_on_spd(self):
        A = laplace_2d(8, 8)
        L, ujj, U = chow_patel_ilu(A, sweeps=8)
        LU = (sp.eye(64) + L) @ (sp.diags(ujj) + U)
        # ILU(0) residual nonzero only at fill positions; off-pattern error
        # bounded for the Laplacian
        err = np.abs((LU - A).toarray()).max()
        assert err < 0.5  # fill-in magnitude for 5-pt Laplace is ~0.25

    def test_fill_level_grows_pattern(self):
        A = laplace_2d(6, 6)
        G1 = _fill_pattern(A, 1)
        assert G1.nnz > A.nnz


class TestILUPreconditioner:
    def test_gmres_iteration_reduction(self, mesh8, rng):
        Ah = laplace_2d(12, 12)
        Ac = Ah.tocoo()
        A = ShardedMatrix.from_coo(mesh8, Ah.shape, Ac.row.astype(np.int64),
                                   Ac.col.astype(np.int64), Ac.data)
        x_true = rng.standard_normal(Ah.shape[0])
        b = Ah @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        pre = ilu_setup(A, ILUConfig(), A_host=Ah)
        plain = gmres_setup(A, tol=1e-8, restart=30, maxiter=600)(bd)
        prec = gmres_setup(A, pre.apply, tol=1e-8, restart=30, maxiter=600)(bd)
        assert bool(prec.converged)
        assert int(prec.iters) < int(plain.iters)
        x = from_device_vector(prec.x, A.row_offsets, A.row_pad)
        np.testing.assert_allclose(x, x_true, rtol=1e-5, atol=1e-6)

    def test_bicgstab_nonsym(self, mesh8, rng):
        Ah = nonsym(96, rng)
        Ac = Ah.tocoo()
        A = ShardedMatrix.from_coo(mesh8, Ah.shape, Ac.row.astype(np.int64),
                                   Ac.col.astype(np.int64), Ac.data)
        x_true = rng.standard_normal(96)
        b = Ah @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        pre = ilu_setup(A, ILUConfig(ilu_lower_jacobi_iters=8,
                                     ilu_upper_jacobi_iters=8), A_host=Ah)
        res = bicgstab_setup(A, pre.apply, tol=1e-10, maxiter=200)(bd)
        assert bool(res.converged)
        assert int(res.iters) < 30
        x = from_device_vector(res.x, A.row_offsets, A.row_pad)
        np.testing.assert_allclose(x, x_true, rtol=1e-5, atol=1e-6)

    def test_ilut_mode(self, mesh8, rng):
        Ah = laplace_2d(8, 8)
        Ac = Ah.tocoo()
        A = ShardedMatrix.from_coo(mesh8, Ah.shape, Ac.row.astype(np.int64),
                                   Ac.col.astype(np.int64), Ac.data)
        pre = ilu_setup(A, ILUConfig(ilu_type=1, ilu_fill_level=1,
                                     ilu_drop_threshold=1e-2), A_host=Ah)
        assert pre.notes  # substitution recorded
        b = to_device_vector(mesh8, np.ones(64), A.row_offsets, A.row_pad)
        res = gmres_setup(A, pre.apply, tol=1e-8, restart=20, maxiter=300)(b)
        assert bool(res.converged)


class TestILUTCapAndReordering:
    """ilu_max_nnz_per_row (true ILUT cap, ref :344-350) and
    ilu_local_reordering (RCM, ref :351)."""

    def _shard(self, mesh8, Ah):
        Ac = Ah.tocoo()
        return ShardedMatrix.from_coo(
            mesh8, Ah.shape, Ac.row.astype(np.int64),
            Ac.col.astype(np.int64), Ac.data)

    def test_max_nnz_cap_enforced(self, mesh8):
        from tpusolve.ilu.ilu import _cap_row_nnz
        Ah = laplace_2d(10, 10)
        cap = 3
        M = _cap_row_nnz(Ah, cap)
        assert int(np.diff(M.indptr).max()) <= cap
        # kept entries are the largest-magnitude ones per row
        r0 = np.abs(Ah[0].toarray().ravel())
        kept = np.abs(M[0].toarray().ravel())
        assert set(np.flatnonzero(kept)) <= set(
            np.argsort(-r0)[:cap])

    def test_ilut_cap_in_setup(self, mesh8):
        Ah = laplace_2d(10, 10)
        A = self._shard(mesh8, Ah)
        pre = ilu_setup(A, ILUConfig(ilu_type=1, ilu_fill_level=2,
                                     ilu_drop_threshold=0.0,
                                     ilu_max_nnz_per_row=4), A_host=Ah)
        Lh = pre.L.to_scipy().tocsr()
        assert int(np.diff(Lh.indptr).max()) <= 4

    def test_rcm_reordering_still_preconditions(self, mesh8, rng):
        Ah = laplace_2d(12, 12)
        # scramble the natural ordering so RCM has something to undo
        p = rng.permutation(Ah.shape[0])
        Ah = Ah[p][:, p].tocsr()
        A = self._shard(mesh8, Ah)
        x_true = rng.standard_normal(Ah.shape[0])
        b = Ah @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        pre = ilu_setup(A, ILUConfig(ilu_local_reordering=1), A_host=Ah)
        assert any("RCM" in n for n in pre.notes)
        res = gmres_setup(A, pre.apply, tol=1e-8, restart=30, maxiter=600)(bd)
        assert bool(res.converged)
        plain = gmres_setup(A, tol=1e-8, restart=30, maxiter=600)(bd)
        assert int(res.iters) < int(plain.iters)
        x = from_device_vector(res.x, A.row_offsets, A.row_pad)
        np.testing.assert_allclose(x, x_true, rtol=1e-5, atol=1e-6)
