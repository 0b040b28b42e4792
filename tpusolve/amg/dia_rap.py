"""Galerkin RAP directly in DIA (box) representation.

For the structured hierarchy the transfer operator is separable,
P = Pz (x) Py (x) Px, with the 1-D cell-centered stencil

    P[2c,   c] = .75   P[2c,   c-1] = .25     (clamped at edges)
    P[2c+1, c] = .75   P[2c+1, c+1] = .25

so the triple product contracts one axis at a time: each pass transforms
the operator's offset/value arrays with a fixed set of strided
slice-multiply-add terms — no sparse matrices, no sorts.  This replaces the
scipy ``P^T (A P)`` spmm (the dominant setup cost: ~100 s/level at 2M rows
on one host core) with a few vectorized array passes.

Representation: ``{offset_tuple: value_array}`` where ``value_array`` has
the (possibly partially coarsened) box shape and entry ``v[cell]`` is the
coupling from ``cell`` to ``cell + offset``.  Boundary-clamp corrections are
applied as localized edge fixups, making the result exactly equal to the
scipy RAP built from the same clamped P (validated to ~1e-13 in tests).

1-D derivation.  Column X of P has entries at fine rows f = 2X + s for
s in {-1, 0, 1, 2} with weights {.25, .75, .75, .25}, plus clamp extras
(+.25 at (f=0, X=0) and (f=m-1, X=mc-1)).  A fine coupling A[f, f+d] lands
on coarse (X, X') with f' = 2X + s + d and X' the two P-row targets of f'
(clamped into [0, mc)).
"""

from __future__ import annotations

import numpy as np

# (s, row-weight): fine rows of P column X are f = 2X + s
_ROW_TERMS = ((-1, 0.25), (0, 0.75), (1, 0.75), (2, 0.25))


def _col_branches(e: int):
    """fine col f' = 2X + e -> ((coarse offset X'-X, col-weight), ...)."""
    if e % 2 == 0:
        m = e // 2
        return ((m, 0.75), (m - 1, 0.25))
    m = (e - 1) // 2
    return ((m, 0.75), (m + 1, 0.25))


def dia_rap_axis(dia: dict, box: tuple, axis: int) -> tuple[dict, tuple]:
    """Contract one axis with the clamped cell-centered P (P^T . A . P on
    that axis only).  Returns (coarse dia dict, coarse box)."""
    m = box[axis]
    mc = m // 2
    if m % 2:
        raise ValueError(f"axis {axis} has odd extent {m}")
    cbox = tuple(mc if i == axis else d for i, d in enumerate(box))
    nd = len(box)
    out: dict[tuple, np.ndarray] = {}

    def acc(off_in, ax_off, sl_out, values):
        off_out = tuple(ax_off if i == axis else c
                        for i, c in enumerate(off_in))
        arr = out.get(off_out)
        if arr is None:
            arr = np.zeros(cbox, values.dtype)
            out[off_out] = arr
        arr[sl_out] += values

    def point(off, vals, X, f, ax_off, w):
        """single (coarse row X) <- (fine row f) contribution."""
        if not (0 <= f < m and 0 <= X < mc):
            return
        sl_in = [slice(None)] * nd
        sl_out = [slice(None)] * nd
        sl_in[axis] = slice(f, f + 1)
        sl_out[axis] = slice(X, X + 1)
        acc(off, ax_off, tuple(sl_out), w * vals[tuple(sl_in)])

    for off, vals in dia.items():
        d = off[axis]
        for s, ws in _ROW_TERMS:
            e = s + d
            for ax_off, wp in _col_branches(e):
                w = ws * wp
                # coarse rows whose fine row 2X+s is in range
                X_lo = max(0, (-s + 1) // 2)
                X_hi = min(mc - 1, (m - 1 - s) // 2)
                if X_lo > X_hi:
                    continue
                # bulk: coarse col X+ax_off also in range
                B_lo = max(X_lo, -ax_off)
                B_hi = min(X_hi, mc - 1 - ax_off)
                if B_lo <= B_hi:
                    sl_in = [slice(None)] * nd
                    sl_out = [slice(None)] * nd
                    sl_in[axis] = slice(2 * B_lo + s, 2 * B_hi + s + 1, 2)
                    sl_out[axis] = slice(B_lo, B_hi + 1)
                    acc(off, ax_off, tuple(sl_out), w * vals[tuple(sl_in)])
                # edge rows whose target column fell outside: clamp back in
                for X in (list(range(X_lo, min(B_lo, X_hi + 1)))
                          + list(range(max(B_hi + 1, X_lo), X_hi + 1))):
                    Xc = min(max(X + ax_off, 0), mc - 1)
                    point(off, vals, X, 2 * X + s, Xc - X, w)
        # clamp extras on the restriction side: column X=0 carries an extra
        # +.25 weight at fine row 0; column X=mc-1 at fine row m-1
        for X0, f0 in ((0, 0), (mc - 1, m - 1)):
            e = (f0 - 2 * X0) + d
            for ax_off, wp in _col_branches(e):
                Xc = min(max(X0 + ax_off, 0), mc - 1)
                point(off, vals, X0, f0, Xc - X0, 0.25 * wp)
    return out, cbox


def dia_rap(dia: dict, box: tuple) -> tuple[dict, tuple]:
    """Full n-D Galerkin RAP: contract every axis in turn, dropping
    numerically empty diagonals."""
    cur, cbox = dia, tuple(box)
    for axis in range(len(box)):
        cur, cbox = dia_rap_axis(cur, cbox, axis)
    cur = {k: v for k, v in cur.items() if np.any(v != 0)}
    return cur, cbox
