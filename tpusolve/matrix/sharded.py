"""ShardedMatrix — the ParCSR-analog distributed sparse format for TPU.

HYPRE stores a distributed matrix as a 1-D row-block partition with each
rank holding a *diag* CSR block (columns it owns) and an *offd* CSR block
(ghost columns) plus a communication package for SpMV halo exchange
(consumed by the reference via ``HYPRE_ParCSRMatrix``, ref:
src/HypreSystem.cpp:552-636, 679).

The TPU-native equivalent here:

* the row dimension is sharded over a 1-D ``jax.sharding.Mesh`` axis;
* each device holds **padded-ELL** diag/offd blocks — every row padded to a
  fixed width so all shapes are static and gathers vectorize over 8x128
  lanes (padding entries carry value 0 and column 0, so they contribute
  nothing to SpMV);
* the halo exchange is a precomputed static plan executed as one
  ``lax.all_to_all`` over ICI per SpMV: ``send_idx[q]`` lists the local
  x-entries each peer ``q`` needs, and ``ghost_slot`` maps positions of the
  received buffer into the device's ghost ordering;
* rows and columns may have different decompositions (rectangular
  operators: AMG interpolation/restriction).

All per-device arrays are stacked along a leading mesh axis of size
``nparts`` and placed with ``NamedSharding(mesh, P(axis))``, so a
``shard_map`` over the same mesh sees exactly one shard each.

Rows are padded per shard to the max shard size (``row_pad``); padded vector
entries are maintained as exact zeros by every kernel in the framework, and
padded diagonal entries are 1, so smoothers and dot products need no masks.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import cached_property

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpusolve.mesh import ROWS_AXIS, row_decomposition
from tpusolve.matrix import coo as coo_mod


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedMatrix:
    # --- device data (leading axis = shard) ---
    diag_vals: jax.Array   # (Pn, R, Kd) float
    diag_cols: jax.Array   # (Pn, R, Kd) int32, local col index
    offd_vals: jax.Array   # (Pn, R, Ko) float
    offd_cols: jax.Array   # (Pn, R, Ko) int32, ghost slot index
    send_idx: jax.Array    # (Pn, Pn, S) int32, local x-indices sent to peer q
    ghost_slot: jax.Array  # (Pn, G) int32, index into all_to_all recv buffer
    diag: jax.Array        # (Pn, R) main diagonal (1.0 on padded rows); square only
    # --- static metadata ---
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    row_offsets: tuple = dataclasses.field(metadata=dict(static=True))
    col_offsets: tuple = dataclasses.field(metadata=dict(static=True))
    row_pad: int = dataclasses.field(metadata=dict(static=True))
    col_pad: int = dataclasses.field(metadata=dict(static=True))
    mesh: jax.sharding.Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------
    @property
    def nparts(self) -> int:
        return len(self.row_offsets) - 1

    @property
    def padded_nrows(self) -> int:
        return self.nparts * self.row_pad

    @property
    def padded_ncols(self) -> int:
        return self.nparts * self.col_pad

    @property
    def dtype(self):
        return self.diag_vals.dtype

    @property
    def is_square(self) -> bool:
        return self.shape[0] == self.shape[1] and self.row_offsets == self.col_offsets

    # ------------------------------------------------------------------
    @staticmethod
    def from_coo(mesh, shape, rows, cols, vals, *, dtype=None, dedup="add",
                 row_offsets=None, col_offsets=None, axis: str = ROWS_AXIS,
                 ell_align: int = 1):
        """Assemble a global COO into the sharded format.

        Implements the full IJ ``SetValues/AddToValues + Assemble`` pipeline
        (ref: src/HypreSystem.cpp:600-636, 897-955): entries for any global
        (row, col) in any order, duplicates combined per ``dedup``.
        """
        nrows, ncols = shape
        nparts = mesh.devices.size
        if row_offsets is None:
            row_offsets = row_decomposition(nrows, nparts)
        row_offsets = np.asarray(row_offsets, np.int64)
        if col_offsets is None:
            col_offsets = (row_offsets if ncols == nrows
                           else row_decomposition(ncols, nparts))
        col_offsets = np.asarray(col_offsets, np.int64)

        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals)
        if rows.size and (rows.min() < 0 or rows.max() >= nrows):
            raise ValueError("row index out of range")
        if cols.size and (cols.min() < 0 or cols.max() >= ncols):
            raise ValueError("col index out of range")
        r, c, v = coo_mod.dedup_coo(rows, cols, vals, mode=dedup)
        parts = coo_mod.bucket_by_owner(r, c, v, row_offsets)
        return ShardedMatrix.from_local_parts(
            mesh, shape, parts, dtype=dtype, row_offsets=row_offsets,
            col_offsets=col_offsets, axis=axis, ell_align=ell_align)

    @staticmethod
    def from_local_parts(mesh, shape, parts, *, dtype=None, row_offsets=None,
                         col_offsets=None, axis: str = ROWS_AXIS,
                         ell_align: int = 1):
        """Assemble from per-shard (local_rows, global_cols, vals) triples.

        ``parts[p]`` holds entries whose global row lies in part ``p``'s row
        block, with rows already localized.  Entries must be unique per
        (row, col) and sorted by (row, col).  This is the fast path used by
        generators that build their shard directly (the analog of the
        reference's on-device stencil assembly, src/HypreSystem.cpp:1476-1608).
        """
        nrows, ncols = shape
        nparts = mesh.devices.size
        if len(parts) != nparts:
            raise ValueError(f"need {nparts} parts, got {len(parts)}")
        if row_offsets is None:
            row_offsets = row_decomposition(nrows, nparts)
        row_offsets = np.asarray(row_offsets, np.int64)
        if col_offsets is None:
            col_offsets = (row_offsets if ncols == nrows
                           else row_decomposition(ncols, nparts))
        col_offsets = np.asarray(col_offsets, np.int64)
        if dtype is None:
            dtype = parts[0][2].dtype if parts[0][2].size else np.float64
            if np.issubdtype(dtype, np.integer):
                dtype = np.float64

        row_counts = np.diff(row_offsets)
        col_counts = np.diff(col_offsets)
        row_pad = max(1, int(row_counts.max()))
        col_pad = max(1, int(col_counts.max()))

        # --- split diag/offd, compute ghost lists, per-row widths ---
        diag_parts, offd_parts, ghost_lists = [], [], []
        kd = ko = 1
        for p in range(nparts):
            lr, gc, v = parts[p]
            lr = np.asarray(lr, np.int64)
            gc = np.asarray(gc, np.int64)
            v = np.asarray(v, dtype)
            lo, hi = col_offsets[p], col_offsets[p + 1]
            is_diag = (gc >= lo) & (gc < hi)
            dlr, dlc, dv = lr[is_diag], (gc[is_diag] - lo), v[is_diag]
            olr, ogc, ov = lr[~is_diag], gc[~is_diag], v[~is_diag]
            ghosts = np.unique(ogc)
            og = np.searchsorted(ghosts, ogc)
            diag_parts.append((dlr, dlc.astype(np.int64), dv))
            offd_parts.append((olr, og.astype(np.int64), ov))
            ghost_lists.append(ghosts)
            nr = int(row_counts[p])
            if dlr.size:
                kd = max(kd, int(np.bincount(dlr, minlength=nr).max()))
            if olr.size:
                ko = max(ko, int(np.bincount(olr, minlength=nr).max()))
        kd = _ceil_to(kd, ell_align)
        ko = _ceil_to(ko, ell_align)
        ghost_pad = max(1, max(g.size for g in ghost_lists))

        # --- halo plan: what each owner sends to each peer ---
        # column ownership is a contiguous block partition, so each ghost
        # list is already grouped by owner; positions within the group give
        # the recv-slot layout directly.
        send_counts = np.zeros((nparts, nparts), np.int64)
        for q in range(nparts):
            gl = ghost_lists[q]
            st = np.searchsorted(gl, col_offsets)
            send_counts[:, q] = np.diff(st)
        send_pad = max(1, int(send_counts.max()))

        send_idx = np.zeros((nparts, nparts, send_pad), np.int32)
        ghost_slot = np.zeros((nparts, ghost_pad), np.int32)
        for q in range(nparts):
            gl = ghost_lists[q]
            st = np.searchsorted(gl, col_offsets)
            owners = np.searchsorted(col_offsets, gl, side="right") - 1
            pos = np.arange(gl.size) - st[owners]
            ghost_slot[q, :gl.size] = owners * send_pad + pos
            for p in range(nparts):
                seg = gl[st[p]:st[p + 1]] - col_offsets[p]
                send_idx[p, q, :seg.size] = seg

        # --- ELL pack ---
        dvals = np.zeros((nparts, row_pad, kd), dtype)
        dcols = np.zeros((nparts, row_pad, kd), np.int32)
        ovals = np.zeros((nparts, row_pad, ko), dtype)
        ocols = np.zeros((nparts, row_pad, ko), np.int32)
        diag_main = np.zeros((nparts, row_pad), dtype)
        for p in range(nparts):
            nr = int(row_counts[p])
            _ell_fill(dvals[p], dcols[p], *diag_parts[p], nr)
            _ell_fill(ovals[p], ocols[p], *offd_parts[p], nr)
            diag_main[p, nr:] = 1.0  # padded rows: unit diagonal
            dlr, dlc, dv = diag_parts[p]
            if row_offsets[p] == col_offsets[p] and dlr.size:
                on_diag = dlc == dlr
                diag_main[p, dlr[on_diag]] += dv[on_diag]

        sharding = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, sharding)
        nnz = int(sum(p[2].size for p in parts))
        return ShardedMatrix(
            diag_vals=put(dvals), diag_cols=put(dcols),
            offd_vals=put(ovals), offd_cols=put(ocols),
            send_idx=put(send_idx), ghost_slot=put(ghost_slot),
            diag=put(diag_main),
            shape=(int(nrows), int(ncols)),
            row_offsets=tuple(int(o) for o in row_offsets),
            col_offsets=tuple(int(o) for o in col_offsets),
            row_pad=row_pad, col_pad=col_pad, mesh=mesh, axis=axis, nnz=nnz)

    # ------------------------------------------------------------------
    def to_scipy(self):
        """Reconstruct the global matrix as scipy CSR (testing/host use)."""
        import scipy.sparse as sp
        ro = np.asarray(self.row_offsets)
        co = np.asarray(self.col_offsets)
        dvals = np.asarray(self.diag_vals)
        dcols = np.asarray(self.diag_cols)
        ovals = np.asarray(self.offd_vals)
        ocols = np.asarray(self.offd_cols)
        send_idx = np.asarray(self.send_idx)
        ghost_slot = np.asarray(self.ghost_slot)
        S = send_idx.shape[-1]
        rows, cols, vals = [], [], []
        for p in range(self.nparts):
            nr = int(ro[p + 1] - ro[p])
            # rebuild ghost globals from the plan: slot -> owner, local idx
            owners = ghost_slot[p] // S
            pos = ghost_slot[p] % S
            ghost_globals = co[owners] + send_idx[owners, p, pos]
            for ell_v, ell_c, colmap in (
                    (dvals[p], dcols[p], None),
                    (ovals[p], ocols[p], ghost_globals)):
                r_idx, k_idx = np.nonzero(ell_v[:nr] != 0)
                lc = ell_c[:nr][r_idx, k_idx]
                gcol = (co[p] + lc) if colmap is None else colmap[lc]
                rows.append(ro[p] + r_idx)
                cols.append(gcol)
                vals.append(ell_v[:nr][r_idx, k_idx])
        rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
        cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
        vals = np.concatenate(vals) if vals else np.zeros(0)
        return sp.csr_matrix((vals, (rows, cols)), shape=self.shape)

    def diagonal_padded(self) -> jax.Array:
        """Main diagonal as a padded sharded vector of shape
        (nparts * row_pad,), 1.0 at padded slots."""
        return self.diag.reshape(self.padded_nrows)


def _ell_fill(vals_ell, cols_ell, lrows, lcols, vals, nrows):
    """Scatter sorted-by-row COO into ELL rows (position = rank within row)."""
    if lrows.size == 0:
        return
    counts = np.bincount(lrows, minlength=nrows)
    starts = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(lrows.size) - starts[lrows]
    vals_ell[lrows, pos] = vals
    cols_ell[lrows, pos] = lcols.astype(np.int32)
