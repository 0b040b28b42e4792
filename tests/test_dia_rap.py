import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.amg.dia_rap import dia_rap, dia_rap_axis
from tpusolve.amg.structured import _p_box, _p1d
from tpusolve.amg import galerkin


def _dia_to_csr(dia: dict, box: tuple) -> sp.csr_matrix:
    n = int(np.prod(box))
    strides = np.array([int(np.prod(box[i + 1:])) for i in range(len(box))])
    rows_l, cols_l, vals_l = [], [], []
    idx = np.indices(box).reshape(len(box), -1)
    flat = np.arange(n)
    for off, v in dia.items():
        tgt = idx + np.asarray(off)[:, None]
        ok = np.all((tgt >= 0) & (tgt < np.asarray(box)[:, None]), axis=0)
        rows_l.append(flat[ok])
        cols_l.append(flat[ok] + int(np.dot(off, strides)))
        vals_l.append(v.reshape(-1)[ok])
    return sp.csr_matrix((np.concatenate(vals_l),
                          (np.concatenate(rows_l), np.concatenate(cols_l))),
                         shape=(n, n))


def _random_box_dia(rng, box, offsets3):
    """Random box-consistent DIA operator (zero where neighbor leaves box)."""
    dia = {}
    grids = np.indices(box)
    for off in offsets3:
        mask = np.ones(box, bool)
        for ax, o in enumerate(off):
            mask &= (grids[ax] + o >= 0) & (grids[ax] + o < box[ax])
        dia[tuple(off)] = np.where(mask, rng.standard_normal(box), 0.0)
    return dia


OFF27 = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)]


class TestDiaRap:
    @pytest.mark.parametrize("box", [(4, 4, 4), (6, 4, 8), (4, 6, 6)])
    def test_matches_scipy_rap(self, rng, box):
        dia = _random_box_dia(rng, box, OFF27)
        A = _dia_to_csr(dia, box)
        P = _p_box(box)
        Ac_ref = galerkin.rap(A, P)
        dc, cbox = dia_rap(dia, box)
        Ac = _dia_to_csr(dc, cbox)
        np.testing.assert_allclose(Ac.toarray(), Ac_ref.toarray(),
                                   rtol=1e-12, atol=1e-13)

    def test_single_axis_matches_kron_rap(self, rng):
        box = (4, 4, 6)
        dia = _random_box_dia(rng, box, OFF27)
        A = _dia_to_csr(dia, box)
        # contract only the last axis: P = I (x) I (x) Px
        Px = _p1d(box[2])
        P = sp.kron(sp.eye(box[0] * box[1]), Px).tocsr()
        Ac_ref = (P.T @ (A @ P)).tocsr()
        dc, cbox = dia_rap_axis(dia, box, 2)
        Ac = _dia_to_csr(dc, cbox)
        np.testing.assert_allclose(Ac.toarray(), Ac_ref.toarray(),
                                   rtol=1e-12, atol=1e-13)

    def test_two_levels(self, rng):
        box = (8, 8, 8)
        dia = _random_box_dia(rng, box, OFF27)
        A = _dia_to_csr(dia, box)
        P1 = _p_box(box)
        A1_ref = galerkin.rap(A, P1)
        P2 = _p_box((4, 4, 4))
        A2_ref = galerkin.rap(A1_ref, P2)
        d1, b1 = dia_rap(dia, box)
        d2, b2 = dia_rap(d1, b1)
        np.testing.assert_allclose(_dia_to_csr(d2, b2).toarray(),
                                   A2_ref.toarray(), rtol=1e-11, atol=1e-12)

    def test_coarse_offsets_bounded(self, rng):
        dia = _random_box_dia(rng, (8, 8, 8), OFF27)
        dc, cbox = dia_rap(dia, (8, 8, 8))
        for off in dc:
            assert all(abs(o) <= 2 for o in off)
        assert len(dc) <= 125
