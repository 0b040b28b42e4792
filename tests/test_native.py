import io
import numpy as np
import pytest

from tpusolve.native import available, get_lib
from tpusolve.formats import mmio, ij
from tpusolve.mesh import row_decomposition


pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")


def test_lib_builds():
    assert get_lib() is not None


def test_mm_native_matches_python(rng, tmp_path):
    n, m, nnz = 50, 40, 200
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    key = rows * m + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.standard_normal(len(rows)) * 10.0 ** rng.integers(-8, 8, len(rows))
    path = tmp_path / "A.mm"
    mmio.write_matrix(path, rows, cols, vals, (n, m),
                      comment="header comment\nsecond line")
    r1, c1, v1, shape = mmio.read_matrix(path)
    # force the python fallback via a file object
    with open(path) as fh:
        r2, c2, v2, _ = mmio.read_matrix(fh)
    o1 = np.lexsort((c1, r1))
    o2 = np.lexsort((c2, r2))
    np.testing.assert_array_equal(r1[o1], r2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    np.testing.assert_allclose(v1[o1], v2[o2], rtol=1e-15)


def test_mm_native_complex(rng, tmp_path):
    n = 12
    rows = np.arange(n)
    cols = (rows * 3) % n
    vals = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    path = tmp_path / "C.mm"
    mmio.write_matrix(path, rows, cols, vals, (n, n))
    r1, c1, v1, _ = mmio.read_matrix(path)
    with open(path) as fh:
        r2, c2, v2, _ = mmio.read_matrix(fh)
    o1, o2 = np.lexsort((c1, r1)), np.lexsort((c2, r2))
    np.testing.assert_allclose(v1[o1], v2[o2], rtol=1e-15)


def test_ij_native_matches_python(rng, tmp_path):
    n = 40
    rows = rng.integers(0, n, 150)
    cols = rng.integers(0, n, 150)
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.standard_normal(len(rows))
    offsets = row_decomposition(n, 3)
    prefix = str(tmp_path / "m")
    ij.write_matrix(prefix, rows, cols, vals, offsets)
    r, c, v = ij.read_matrix(prefix, 3)
    import scipy.sparse as sp
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
    b = sp.coo_matrix((v, (r, c)), shape=(n, n)).toarray()
    np.testing.assert_allclose(a, b, rtol=1e-15)


def test_ij_vector_native(rng, tmp_path):
    n = 33
    vec = rng.standard_normal(n)
    offsets = row_decomposition(n, 4)
    prefix = str(tmp_path / "v")
    ij.write_vector(prefix, vec, offsets)
    out = ij.read_dense_vector(prefix, 4, n)
    np.testing.assert_allclose(out, vec, rtol=1e-15)


def test_native_speed_smoke(rng, tmp_path):
    # large-ish file parses correctly end-to-end
    n = 200_000
    rows = np.arange(n)
    cols = (rows * 7 + 3) % n
    vals = rng.standard_normal(n)
    path = tmp_path / "big.mm"
    mmio.write_matrix(path, rows, cols, vals, (n, n))
    import time
    t0 = time.perf_counter()
    r, c, v, _ = mmio.read_matrix(path)
    dt = time.perf_counter() - t0
    assert len(v) == n
    np.testing.assert_allclose(v[:5], vals[:5], rtol=1e-15)
    assert dt < 5.0
