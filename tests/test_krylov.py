import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.vectors import to_device_vector, from_device_vector
from tpusolve.krylov import (
    pcg_setup, gmres_setup, cogmres_setup, fgmres_setup, bicgstab_setup)


def laplace_1d(n):
    """SPD tridiagonal Laplacian."""
    main = 2.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    A = sp.diags([off, main, off], [-1, 0, 1]).tocoo()
    return A


def nonsym_advection(n, rng):
    """Non-symmetric advection-diffusion-like matrix, well conditioned."""
    main = 4.0 * np.ones(n)
    lower = -1.5 * np.ones(n - 1)
    upper = -0.5 * np.ones(n - 1)
    A = sp.diags([lower, main, upper], [-1, 0, 1]).tocoo()
    return A


def _to_sharded(mesh, Acoo):
    return ShardedMatrix.from_coo(mesh, Acoo.shape, Acoo.row.astype(np.int64),
                                  Acoo.col.astype(np.int64), Acoo.data)


def _solve_and_check(mesh, Acoo, setup_fn, rng, tol=1e-10, x_rtol=1e-7, **kw):
    n = Acoo.shape[0]
    A = _to_sharded(mesh, Acoo)
    x_true = rng.standard_normal(n)
    b = Acoo.tocsr() @ x_true
    bd = to_device_vector(mesh, b, A.row_offsets, A.row_pad)
    solve = setup_fn(A, tol=tol, maxiter=2000, **kw)
    res = solve(bd)
    x = from_device_vector(res.x, A.row_offsets, A.row_pad)
    assert bool(res.converged), f"not converged: relres={float(res.relres)}"
    np.testing.assert_allclose(x, x_true, rtol=x_rtol, atol=1e-8)
    return res


class TestPCG:
    def test_spd_laplace(self, mesh8, rng):
        res = _solve_and_check(mesh8, laplace_1d(96), pcg_setup, rng)
        # unpreconditioned CG on 1-D Laplace needs ~n iterations
        assert int(res.iters) <= 96

    def test_uneven_rows(self, mesh8, rng):
        _solve_and_check(mesh8, laplace_1d(61), pcg_setup, rng)

    def test_jacobi_preconditioner(self, mesh8, rng):
        Acoo = laplace_1d(96)
        A = _to_sharded(mesh8, Acoo)
        dinv = 1.0 / A.diagonal_padded()
        M = lambda r: dinv * r
        n = Acoo.shape[0]
        x_true = rng.standard_normal(n)
        b = Acoo.tocsr() @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        res = pcg_setup(A, M, tol=1e-10, maxiter=500)(bd)
        x = from_device_vector(res.x, A.row_offsets, A.row_pad)
        assert bool(res.converged)
        np.testing.assert_allclose(x, x_true, rtol=1e-7, atol=1e-8)

    def test_zero_rhs(self, mesh8):
        A = _to_sharded(mesh8, laplace_1d(32))
        b = to_device_vector(mesh8, np.zeros(32), A.row_offsets, A.row_pad)
        res = pcg_setup(A, tol=1e-8)(b)
        assert bool(res.converged)
        assert int(res.iters) == 0
        assert np.all(from_device_vector(res.x, A.row_offsets, A.row_pad) == 0)

    def test_initial_guess(self, mesh8, rng):
        Acoo = laplace_1d(48)
        A = _to_sharded(mesh8, Acoo)
        x_true = rng.standard_normal(48)
        b = Acoo.tocsr() @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        x0 = to_device_vector(mesh8, x_true, A.row_offsets, A.row_pad)
        res = pcg_setup(A, tol=1e-10)(bd, x0)
        assert int(res.iters) == 0  # exact initial guess


class TestGMRES:
    def test_nonsym(self, mesh8, rng):
        res = _solve_and_check(mesh8, nonsym_advection(80, rng), gmres_setup,
                               rng, restart=20)
        assert int(res.iters) < 200

    def test_restart_smaller_than_needed(self, mesh8, rng):
        # forces multiple restart cycles
        _solve_and_check(mesh8, nonsym_advection(80, rng), gmres_setup, rng,
                         restart=5)

    def test_spd_matches_cg_solution(self, mesh8, rng):
        _solve_and_check(mesh8, laplace_1d(64), gmres_setup, rng, restart=64)

    def test_cgs2(self, mesh8, rng):
        _solve_and_check(mesh8, nonsym_advection(80, rng), cogmres_setup, rng,
                         restart=20, cgs=2)

    def test_fgmres(self, mesh8, rng):
        _solve_and_check(mesh8, nonsym_advection(80, rng), fgmres_setup, rng,
                         restart=20)

    def test_fgmres_with_precond(self, mesh8, rng):
        Acoo = nonsym_advection(80, rng)
        A = _to_sharded(mesh8, Acoo)
        dinv = 1.0 / A.diagonal_padded()
        M = lambda r: dinv * r
        x_true = rng.standard_normal(80)
        b = Acoo.tocsr() @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        res = fgmres_setup(A, M, tol=1e-10, restart=20, maxiter=500)(bd)
        x = from_device_vector(res.x, A.row_offsets, A.row_pad)
        assert bool(res.converged)
        np.testing.assert_allclose(x, x_true, rtol=1e-7, atol=1e-8)

    def test_gmres_with_jacobi_precond_fewer_iters(self, mesh8, rng):
        Acoo = nonsym_advection(80, rng)
        A = _to_sharded(mesh8, Acoo)
        dinv = 1.0 / A.diagonal_padded()
        x_true = rng.standard_normal(80)
        b = Acoo.tocsr() @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        plain = gmres_setup(A, tol=1e-10, restart=20, maxiter=500)(bd)
        prec = gmres_setup(A, lambda r: dinv * r, tol=1e-10, restart=20,
                           maxiter=500)(bd)
        assert bool(prec.converged)
        assert int(prec.iters) <= int(plain.iters)


class TestBiCGSTAB:
    def test_nonsym(self, mesh8, rng):
        res = _solve_and_check(mesh8, nonsym_advection(80, rng),
                               bicgstab_setup, rng)
        assert int(res.iters) < 100

    def test_with_precond(self, mesh8, rng):
        Acoo = nonsym_advection(80, rng)
        A = _to_sharded(mesh8, Acoo)
        dinv = 1.0 / A.diagonal_padded()
        M = lambda r: dinv * r
        x_true = rng.standard_normal(80)
        b = Acoo.tocsr() @ x_true
        bd = to_device_vector(mesh8, b, A.row_offsets, A.row_pad)
        res = bicgstab_setup(A, M, tol=1e-10, maxiter=500)(bd)
        x = from_device_vector(res.x, A.row_offsets, A.row_pad)
        assert bool(res.converged)
        np.testing.assert_allclose(x, x_true, rtol=1e-7, atol=1e-8)

    def test_spd(self, mesh8, rng):
        # BiCGSTAB's recurrence residual drifts from the true residual, and
        # the 1-D Laplacian has cond ~ (n/pi)^2, so allow a looser x check.
        _solve_and_check(mesh8, laplace_1d(64), bicgstab_setup, rng,
                         x_rtol=1e-4)


class TestSteppedPCG:
    def test_stepped_matches_fused(self, mesh1):
        """pcg_setup(fused=False) — one jitted step per iteration, for
        memory-ceiling runs — must follow the fused while_loop program
        iteration for iteration."""
        import numpy as np
        from tpusolve.stencil import laplace27
        from tpusolve.krylov.cg import pcg_setup
        A, b, _ = laplace27(mesh1, 8, 8, 8, dtype=np.float64)
        rf = pcg_setup(A, tol=1e-10, maxiter=80)(b)
        rs = pcg_setup(A, tol=1e-10, maxiter=80, fused=False)(b)
        assert bool(rf.converged) and bool(rs.converged)
        assert int(rf.iters) == int(rs.iters)
        np.testing.assert_allclose(float(rs.relres), float(rf.relres),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rs.x), np.asarray(rf.x),
                                   rtol=1e-9, atol=1e-12)
