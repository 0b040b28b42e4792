import io

import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.formats import mmio, ij
from tpusolve.mesh import row_decomposition


def _rand_coo(rng, n, m, nnz, complex_=False):
    rows = rng.integers(0, n, nnz).astype(np.int64)
    cols = rng.integers(0, m, nnz).astype(np.int64)
    # dedup for exact round trip
    key = rows * m + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.standard_normal(len(rows))
    if complex_:
        vals = vals + 1j * rng.standard_normal(len(rows))
    return rows, cols, vals


class TestMatrixMarket:
    def test_round_trip_real(self, rng, tmp_path):
        rows, cols, vals = _rand_coo(rng, 20, 15, 60)
        path = tmp_path / "m.mm"
        mmio.write_matrix(path, rows, cols, vals, (20, 15))
        info = mmio.read_info(path)
        assert (info.nrows, info.ncols, info.nnz) == (20, 15, len(vals))
        r2, c2, v2, shape = mmio.read_matrix(path)
        assert shape == (20, 15)
        a = sp.coo_matrix((vals, (rows, cols)), shape=(20, 15)).toarray()
        b = sp.coo_matrix((v2, (r2, c2)), shape=shape).toarray()
        np.testing.assert_allclose(a, b, rtol=1e-14)

    def test_round_trip_complex(self, rng, tmp_path):
        rows, cols, vals = _rand_coo(rng, 10, 10, 30, complex_=True)
        path = tmp_path / "c.mm"
        mmio.write_matrix(path, rows, cols, vals, (10, 10))
        r2, c2, v2, shape = mmio.read_matrix(path)
        a = sp.coo_matrix((vals, (rows, cols)), shape=(10, 10)).toarray()
        b = sp.coo_matrix((v2, (r2, c2)), shape=shape).toarray()
        np.testing.assert_allclose(a, b, rtol=1e-14)

    def test_symmetric_expansion(self, tmp_path):
        # lower triangle of [[2,1],[1,3]]
        path = tmp_path / "s.mm"
        with open(path, "w") as fh:
            fh.write("%%MatrixMarket matrix coordinate real symmetric\n")
            fh.write("2 2 3\n1 1 2.0\n2 1 1.0\n2 2 3.0\n")
        r, c, v, shape = mmio.read_matrix(path)
        a = sp.coo_matrix((v, (r, c)), shape=shape).toarray()
        np.testing.assert_allclose(a, [[2, 1], [1, 3]])

    def test_complex_to_real_expansion(self):
        # reference convention src/HypreSystem.cpp:1800-1833
        rows = np.array([0])
        cols = np.array([0])
        vals = np.array([3.0 + 4.0j])
        r, c, v, shape = mmio.expand_complex_to_real(rows, cols, vals, (1, 1))
        a = sp.coo_matrix((v, (r, c)), shape=shape).toarray()
        np.testing.assert_allclose(a, [[3.0, -4.0], [4.0, 3.0]])

    def test_complex_expansion_solve_equivalence(self, rng):
        # solving the expanded real system == solving the complex system
        n = 8
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        A += n * np.eye(n)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        b = A @ x
        rows, cols = np.nonzero(A)
        vals = A[rows, cols]
        r2, c2, v2, shape2 = mmio.expand_complex_to_real(rows, cols, vals, (n, n))
        A2 = sp.coo_matrix((v2, (r2, c2)), shape=shape2).toarray()
        b2 = mmio.expand_complex_vector(b)
        x2 = np.linalg.solve(A2, b2)
        np.testing.assert_allclose(x2[0::2], np.real(x), rtol=1e-10)
        np.testing.assert_allclose(x2[1::2], np.imag(x), rtol=1e-10)

    def test_vector_round_trip(self, rng, tmp_path):
        v = rng.standard_normal(17)
        path = tmp_path / "v.mm"
        mmio.write_vector(path, v)
        v2 = mmio.read_vector(path)
        np.testing.assert_allclose(v, v2, rtol=1e-14)

    def test_complex_vector_round_trip(self, rng, tmp_path):
        v = rng.standard_normal(9) + 1j * rng.standard_normal(9)
        path = tmp_path / "vc.mm"
        mmio.write_vector(path, v)
        v2 = mmio.read_vector(path)
        np.testing.assert_allclose(v, v2, rtol=1e-14)
        inter = mmio.expand_complex_vector(v2)
        np.testing.assert_allclose(inter[0::2], np.real(v))
        np.testing.assert_allclose(inter[1::2], np.imag(v))

    def test_bad_banner_rejected(self):
        with pytest.raises(mmio.MMError):
            mmio.read_info(io.StringIO("garbage\n1 1 1\n"))

    def test_pattern_field(self, tmp_path):
        path = tmp_path / "p.mm"
        with open(path, "w") as fh:
            fh.write("%%MatrixMarket matrix coordinate pattern general\n")
            fh.write("2 2 2\n1 1\n2 2\n")
        r, c, v, shape = mmio.read_matrix(path)
        np.testing.assert_allclose(v, [1.0, 1.0])


class TestHypreIJ:
    def test_matrix_round_trip(self, rng, tmp_path):
        n = 37
        rows, cols, vals = _rand_coo(rng, n, n, 150)
        offsets = row_decomposition(n, 4)
        prefix = str(tmp_path / "mat")
        ij.write_matrix(prefix, rows, cols, vals, offsets)
        assert ij.num_global_rows(prefix, 4) == n
        r2, c2, v2 = ij.read_matrix(prefix, 4)
        a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
        b = sp.coo_matrix((v2, (r2, c2)), shape=(n, n)).toarray()
        np.testing.assert_allclose(a, b, rtol=1e-14)

    def test_row_range_filter(self, rng, tmp_path):
        # mirrors the overlap-filtered read (HypreSystem.cpp:1219-1236)
        n = 20
        rows, cols, vals = _rand_coo(rng, n, n, 80)
        offsets = row_decomposition(n, 3)
        prefix = str(tmp_path / "mat")
        ij.write_matrix(prefix, rows, cols, vals, offsets)
        r2, c2, v2 = ij.read_matrix(prefix, 3, row_range=(5, 12))
        assert r2.size > 0
        assert r2.min() >= 5 and r2.max() <= 12
        mask = (rows >= 5) & (rows <= 12)
        assert r2.size == mask.sum()

    def test_vector_round_trip(self, rng, tmp_path):
        n = 23
        v = rng.standard_normal(n)
        offsets = row_decomposition(n, 5)
        prefix = str(tmp_path / "vec")
        ij.write_vector(prefix, v, offsets)
        v2 = ij.read_dense_vector(prefix, 5, n)
        np.testing.assert_allclose(v, v2, rtol=1e-14)

    def test_partition_count_differs_from_readers(self, rng, tmp_path):
        # num_partitions may differ from the device count (HypreSystem.cpp:1023)
        n = 30
        rows, cols, vals = _rand_coo(rng, n, n, 100)
        write_off = row_decomposition(n, 7)
        prefix = str(tmp_path / "mat")
        ij.write_matrix(prefix, rows, cols, vals, write_off)
        r2, c2, v2 = ij.read_matrix(prefix, 7)
        a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
        b = sp.coo_matrix((v2, (r2, c2)), shape=(n, n)).toarray()
        np.testing.assert_allclose(a, b, rtol=1e-14)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ij.read_matrix(str(tmp_path / "nope"), 2)


class TestShardedIngestion:
    """Per-host sharded reads (VERDICT r1 item 7): two simulated hosts with
    disjoint row ranges must reconstruct the full system, and each must
    retain only its slice (memory scales with 1/nhosts)."""

    def test_two_host_union_reconstructs(self, rng, tmp_path):
        n = 53
        rows, cols, vals = _rand_coo(rng, n, n, 260)
        offsets = row_decomposition(n, 4)
        prefix = str(tmp_path / "mat")
        ij.write_matrix(prefix, rows, cols, vals, offsets)
        mid = n // 2
        r1, c1, v1 = ij.read_matrix(prefix, 4, row_range=(0, mid - 1))
        r2, c2, v2 = ij.read_matrix(prefix, 4, row_range=(mid, n - 1))
        assert r1.size and r2.size
        assert r1.max() < mid <= r2.min()
        a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
        b = sp.coo_matrix((np.concatenate([v1, v2]),
                           (np.concatenate([r1, r2]),
                            np.concatenate([c1, c2]))),
                          shape=(n, n)).toarray()
        np.testing.assert_allclose(a, b, rtol=1e-14)

    def test_dense_vector_row_range(self, rng, tmp_path):
        n = 31
        vec = rng.standard_normal(n)
        offsets = row_decomposition(n, 3)
        prefix = str(tmp_path / "vec")
        ij.write_vector(prefix, vec, offsets)
        half = ij.read_dense_vector(prefix, 3, n, row_range=(10, 20))
        np.testing.assert_allclose(half[10:21], vec[10:21])
        assert np.all(half[:10] == 0) and np.all(half[21:] == 0)

    def test_host_row_range_single_process_is_full(self, mesh8):
        from tpusolve.mesh import host_row_range
        offsets = row_decomposition(100, 8)
        lo, hi = host_row_range(mesh8, offsets)
        assert (lo, hi) == (0, 99)
