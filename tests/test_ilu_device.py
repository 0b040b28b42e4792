"""Device DIA ILU(0) setup (tpusolve/ilu/device_setup.py) vs the host
Chow-Patel factorization on the identical band pattern.

Ref: the reference's iterative (rocSPARSE-style) device ILU0 setup is
configured at src/HypreSystem.cpp:352-361; setup+solve consumed at
:328-370, :457-497."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.config import ILUConfig
from tpusolve.ilu import device_setup as dev
from tpusolve.ilu.ilu import chow_patel_ilu, ilu_setup
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.spmv import _decompose_offset
from tpusolve.mesh import make_mesh
from tpusolve.stencil import laplace27


def band_csr(offsets, planes, dims):
    """Pattern-complete local band CSR from DIA planes: every in-box
    position of every stored diagonal is a pattern entry (explicit zeros
    kept) — the pattern the device factorizer factors on."""
    dims = tuple(dims)
    R = int(np.prod(dims))
    idx = np.arange(R).reshape(dims)
    rows, cols, vals = [], [], []
    for k, off in enumerate(offsets):
        dec = _decompose_offset(int(off), dims)
        sl = tuple(slice(max(0, -c), d - max(0, c))
                   for c, d in zip(dec, dims))
        src = idx[sl].ravel()
        rows.append(src)
        cols.append(src + int(off))
        vals.append(np.asarray(planes[k]).reshape(dims)[sl].ravel())
    M = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(R, R)).tocsr()
    M.sort_indices()
    return M


def host_factors(A_band, sweeps=5):
    L, ujj, U = chow_patel_ilu(A_band, sweeps=sweeps, fill_level=0)
    return L, ujj, U


@pytest.fixture
def enable_device(monkeypatch):
    monkeypatch.setenv("TPUSOLVE_ILU_DEVICE_MIN_N", "1")


class TestDeviceILUParity:
    def test_single_part_matches_host(self, enable_device):
        mesh = make_mesh(1)
        A, b, _ = laplace27(mesh, 6, 5, 4, dtype=np.float64)
        assert A.uses_dia
        pre = ilu_setup(A, ILUConfig())
        assert any("on device" in s for s in pre.notes), pre.notes

        planes = np.asarray(A.dia_vals)[0].reshape(len(A.dia_offsets), -1)
        Ah = band_csr(A.dia_offsets, planes, A.dia_shape)
        Lh, ujj, Uh = host_factors(Ah)

        n = A.shape[0]
        dL = (pre.L.to_scipy() - Lh)
        dU = (pre.U.to_scipy() - Uh)
        assert abs(dL).max() < 1e-12 if dL.nnz else True
        assert abs(dU).max() < 1e-12 if dU.nnz else True
        dinv = np.asarray(pre.udiag_inv)[:n]
        np.testing.assert_allclose(dinv, 1.0 / ujj, rtol=1e-13)

    def test_multi_part_block_jacobi(self, enable_device):
        mesh = make_mesh(4)
        A, b, _ = laplace27(mesh, 6, 4, 8, dtype=np.float64)
        assert A.uses_dia and A.nparts == 4
        pre = ilu_setup(A, ILUConfig())
        assert any("block-Jacobi" in s for s in pre.notes), pre.notes

        # every part factors the same local-box band (the stencil diag
        # block is shared geometry) — compare each against the host
        planes = np.asarray(A.dia_vals)
        Ah = band_csr(A.dia_offsets,
                      planes[0].reshape(len(A.dia_offsets), -1),
                      A.dia_shape)
        Lh, ujj, Uh = host_factors(Ah)
        R = int(np.prod(A.dia_shape))
        from tpusolve.mesh import fetch_host
        lv = fetch_host(pre.L.dia_vals).reshape(4, -1, R)
        uv = fetch_host(pre.U.dia_vals).reshape(4, -1, R)
        l_ref = band_csr(pre.L.dia_offsets,
                         lv[0], A.dia_shape) - Lh
        u_ref = band_csr(pre.U.dia_offsets,
                         uv[0], A.dia_shape) - Uh
        assert (abs(l_ref).max() if l_ref.nnz else 0.0) < 1e-12
        assert (abs(u_ref).max() if u_ref.nnz else 0.0) < 1e-12
        for p in range(1, 4):
            np.testing.assert_array_equal(lv[p], lv[0])
            np.testing.assert_array_equal(uv[p], uv[0])

    def test_nonsymmetric_solve_converges(self, enable_device):
        # momentum-like: asymmetric perturbation of the 27-pt planes,
        # still diagonally dominant — BiCGSTAB + device ILU (gate-4 class)
        mesh = make_mesh(1)
        A0, b, _ = laplace27(mesh, 8, 8, 8, dtype=np.float64)
        offs = A0.dia_offsets
        planes = np.asarray(A0.dia_vals).copy()   # (1, D, *box)
        D = len(offs)
        for k, off in enumerate(offs):
            if off != 0:
                planes[:, k] *= (1.25 if off > 0 else 0.8)
        box = A0.dia_shape
        A = ShardedMatrix.from_dia_parts(
            mesh, A0.shape, offs, planes.reshape(1, D, -1),
            [(np.zeros(0, np.int64), np.zeros(0, np.int64),
              np.zeros(0, np.float64))],
            dtype=np.float64, dia_shape=box)
        pre = ilu_setup(A, ILUConfig())
        assert any("on device" in s for s in pre.notes)
        from tpusolve.krylov.bicgstab import bicgstab_setup
        solve = bicgstab_setup(A, pre.apply, tol=1e-10, maxiter=60)
        res = solve(b)
        assert bool(res.converged)
        plain = bicgstab_setup(A, tol=1e-10, maxiter=200)(b)
        assert int(res.iters) < int(plain.iters)

    def test_host_fallback_for_ilut(self, enable_device):
        mesh = make_mesh(1)
        A, _, _ = laplace27(mesh, 5, 4, 4, dtype=np.float64)
        pre = ilu_setup(A, ILUConfig(ilu_type=1))
        assert not any("on device" in s for s in pre.notes)
