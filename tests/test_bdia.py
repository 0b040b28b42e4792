"""BDIA (blocked-DIA) unstructured SpMV fast path.

The banded-after-RCM shape of the reference's file-loaded nalu-wind
systems (readers ref: src/HypreSystem.cpp:1021-1969); kernel selection is
the TPU analog of the vendor-SpMV toggle (ref: src/main.cpp:137-145).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.spmv import spmv
from tpusolve.matrix.vectors import to_device_vector, from_device_vector
from tpusolve.kernels import bdia


def _banded(rng, n, bw=40, per_row=9):
    """Random banded matrix with per-row drifting offsets — DIA-ineligible
    globally, BDIA-friendly locally (the post-RCM shape)."""
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    jitter = rng.integers(-bw, bw + 1, size=n * per_row)
    cols = np.clip(rows + jitter, 0, n - 1)
    vals = rng.standard_normal(n * per_row)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([vals, np.full(n, 4.0 * per_row)])
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    return rows[idx], cols[idx], vals[idx]


class TestBdiaKernel:
    def test_plan_and_roundtrip(self, rng):
        n = 1100
        r, c, v = _banded(rng, n, bw=25)
        R = 128
        D = bdia.plan_d(r, c, n, n, R)
        assert D >= 1
        starts, flat_idx, vo = bdia.compact(r, c, v, n, n, R, D,
                                            dtype=np.float64)
        B = (n + R - 1) // R
        vals = np.zeros(B * D * R, np.float64)
        vals[flat_idx] = vo
        vals = vals.reshape(B, D, R)
        lo = int(min(0, starts.min()))
        xpad = -lo
        xlen = xpad + int(max(n, starts.max() + R))
        starts_adj = (starts + xpad).astype(np.int32)
        x = rng.standard_normal(n)
        y = np.asarray(bdia.bdia_spmv_local(
            jnp.asarray(vals), jnp.asarray(starts_adj), jnp.asarray(x),
            xpad, xlen, n))
        A = sp.coo_matrix((v, (r, c)), shape=(n, n))
        np.testing.assert_allclose(y[:n], A @ x, rtol=1e-10, atol=1e-10)

    def test_pallas_interpret_matches_xla(self, rng):
        n = 700
        r, c, v = _banded(rng, n, bw=20, per_row=5)
        R = 128
        D = bdia.plan_d(r, c, n, n, R)
        starts, flat_idx, vo = bdia.compact(r, c, v, n, n, R, D,
                                            dtype=np.float32)
        B = (n + R - 1) // R
        vals = np.zeros(B * D * R, np.float32)
        vals[flat_idx] = vo
        vals = vals.reshape(B, D, R)
        xpad = -int(min(0, starts.min()))
        xlen = xpad + int(max(n, starts.max() + R))
        starts_adj = (starts + xpad).astype(np.int32)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.asarray(bdia.bdia_spmv_local(
            jnp.asarray(vals), jnp.asarray(starts_adj), jnp.asarray(x),
            xpad, xlen, n))
        y_pl = np.asarray(bdia.bdia_spmv_pallas(
            jnp.asarray(vals), jnp.asarray(starts_adj), jnp.asarray(x),
            xpad, xlen, n, interpret=True))
        np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-5)

    def test_dmax_too_small_raises(self, rng):
        n = 256
        r, c, v = _banded(rng, n, bw=30)
        with pytest.raises(ValueError):
            bdia.compact(r, c, v, n, n, 64, 1)


def _clustered(rng, n, centers=(-700, 0, 700), spread=1, drift_amp=40):
    """Mesh-like banded matrix: a few offset clusters whose centers drift
    slowly — the genuinely BDIA-friendly (post-RCM) shape.  Uniform-jitter
    bands are intrinsically scattered and correctly select BELL instead."""
    rr = np.arange(n, dtype=np.int64)
    drift = (drift_amp * np.sin(rr / (n / 6.0))).astype(np.int64)
    rows, cols = [], []
    for base in centers:
        for dd in range(-spread, spread + 1):
            c = rr + base + drift + dd
            ok = (c >= 0) & (c < n)   # drop, don't clip: clipping fans a
            rows.append(rr[ok])       # boundary block out to ~|base|
            cols.append(c[ok])        # distinct offsets
    rows = np.concatenate(rows + [rr])
    cols = np.concatenate(cols + [rr])
    vals = rng.standard_normal(rows.size)
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    return rows[idx], cols[idx], vals[idx]


class TestBdiaSharded:
    def test_selected_for_banded_and_matches_scipy(self, rng, mesh8):
        n = 160_000   # above BELL_MIN_NNZ
        r, c, v = _clustered(rng, n)
        A = ShardedMatrix.from_coo(mesh8, (n, n), r, c, v,
                                   dtype=np.float64, allow_dia=False)
        assert A.uses_bdia, "clustered band should select BDIA over BELL"
        S = sp.csr_matrix((v, (r, c)), shape=(n, n))
        x = rng.standard_normal(n)
        xd = to_device_vector(mesh8, x, np.asarray(A.col_offsets),
                              A.col_pad, dtype=np.float64)
        y = from_device_vector(np.asarray(spmv(A, xd)),
                               np.asarray(A.row_offsets), A.row_pad)
        np.testing.assert_allclose(y, S @ x, rtol=1e-10, atol=1e-8)

    def test_to_scipy_roundtrip(self, rng, mesh8):
        n = 60_000
        r, c, v = _banded(rng, n, bw=30, per_row=6)
        A = ShardedMatrix.from_coo(mesh8, (n, n), r, c, v,
                                   dtype=np.float64, allow_dia=False,
                                   allow_bell=False)
        assert A.uses_bdia
        S = sp.csr_matrix((v, (r, c)), shape=(n, n))
        back = A.to_scipy()
        diff = abs(back - S)
        assert diff.max() < 1e-12

    def test_disabled_falls_back(self, rng, mesh8):
        n = 60_000
        r, c, v = _banded(rng, n, bw=30, per_row=6)
        A = ShardedMatrix.from_coo(mesh8, (n, n), r, c, v,
                                   dtype=np.float64, allow_dia=False,
                                   allow_bdia=False)
        assert not A.uses_bdia
