import numpy as np
import pytest
import jax.numpy as jnp

from tpusolve.krylov.refine import refined_solve_setup
from tpusolve.krylov import pcg_setup, gmres_setup
from tpusolve.stencil import laplace27
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.vectors import to_device_vector, from_device_vector


def _both_precisions(mesh, nx, ny, nz):
    A64, b64, x_ref, Ah = laplace27(mesh, nx, ny, nz, dtype=np.float64,
                                    with_host=True)
    A32, b32, _ = laplace27(mesh, nx, ny, nz, dtype=np.float32)
    return A64, A32, b64, Ah


class TestRefinement:
    def test_f32_inner_reaches_1e_12(self, mesh8):
        A64, A32, b64, Ah = _both_precisions(mesh8, 6, 6, 4)
        dinv = 1.0 / A32.diagonal_padded()
        inner = pcg_setup(A32, lambda r: dinv * r, tol=1e-5, maxiter=500)
        solve = refined_solve_setup(A64, inner, tol=1e-12, max_refine=8)
        res = solve(b64)
        assert bool(res.converged), float(res.relres)
        assert float(res.relres) < 1e-12
        x = from_device_vector(res.x, A64.row_offsets, A64.row_pad)
        np.testing.assert_allclose(x, 1.0, rtol=1e-10)

    @pytest.mark.slow
    def test_beats_plain_f32_true_residual(self, mesh8):
        from tpusolve.matrix.spmv import spmv
        A64, A32, b64, Ah = _both_precisions(mesh8, 6, 6, 4)
        b32 = b64.astype(jnp.float32)
        plain = pcg_setup(A32, tol=1e-14, maxiter=400)(b32)
        x64 = plain.x.astype(jnp.float64)
        true_plain = float(jnp.linalg.norm(b64 - spmv(A64, x64))
                           / jnp.linalg.norm(b64))
        inner = pcg_setup(A32, tol=1e-5, maxiter=400)
        res = refined_solve_setup(A64, inner, tol=1e-12, max_refine=8)(b64)
        true_ref = float(jnp.linalg.norm(b64 - spmv(A64, res.x))
                         / jnp.linalg.norm(b64))
        # f32 stagnates around unit-roundoff * cond; IR pushes well past it
        assert true_ref < 1e-12
        assert true_ref < true_plain / 10

    def test_with_gmres_inner(self, mesh8):
        A64, A32, b64, Ah = _both_precisions(mesh8, 6, 4, 4)
        inner = gmres_setup(A32, tol=1e-5, maxiter=600, restart=30)
        res = refined_solve_setup(A64, inner, tol=1e-11, max_refine=8)(b64)
        assert bool(res.converged)
        assert float(res.relres) < 1e-11

    def test_iteration_accounting(self, mesh8):
        A64, A32, b64, Ah = _both_precisions(mesh8, 4, 4, 4)
        inner = pcg_setup(A32, tol=1e-5, maxiter=300)
        res = refined_solve_setup(A64, inner, tol=1e-10, max_refine=5)(b64)
        assert int(res.iters) > 0  # total inner iterations accumulated
