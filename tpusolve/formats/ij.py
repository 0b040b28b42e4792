"""HYPRE-IJ multi-file text format (nalu-wind linear-system dumps).

File naming: ``<prefix>.00000 .. <prefix>.{nfiles-1:05d}``
(ref: src/HypreSystem.cpp:1192-1196).

Matrix file layout (ref reader: src/HypreSystem.cpp:1181-1249)::

    ilower iupper jlower jupper        # inclusive global ranges of this part
    row col value                      # one entry per line

Vector file layout (ref reader: src/HypreSystem.cpp:1252-1318)::

    ilower iupper
    row value

The reference scans headers strided across ranks then all-reduces min/max to
get the global row count (src/HypreSystem.cpp:1138-1176), and every rank then
reads *all* files keeping rows in its owned range.  Here a single host reads
each file once and filters by an optional row range; readers accept
``row_range=(lo, hi)`` inclusive for per-host sharded loading.

Writers produce files the reference's reader parses, closing the
serialization round-trip the reference gets from ``HYPRE_IJMatrixPrint``
(src/HypreSystem.cpp:739-769).
"""

from __future__ import annotations

import io
import os

import numpy as np


def part_path(prefix: str, part: int) -> str:
    return f"{prefix}.{part:05d}"


def determine_matrix_extent(prefix: str, nfiles: int) -> tuple[int, int]:
    """Global (min_row, max_row) from the per-file headers
    (ref: src/HypreSystem.cpp:1138-1176 — note the reference initializes its
    running min/max to 0, which we match: extents are clamped to include 0)."""
    imin, imax = 0, 0
    for p in range(nfiles):
        with open(part_path(prefix, p)) as fh:
            ilower, iupper, _, _ = (int(x) for x in fh.readline().split())
        imin = min(imin, ilower)
        imax = max(imax, iupper)
    return imin, imax


def num_global_rows(prefix: str, nfiles: int) -> int:
    imin, imax = determine_matrix_extent(prefix, nfiles)
    return imax - imin + 1


def _read_body(fh, ncols: int):
    body = fh.read()
    if not body.strip():
        return np.zeros((0, ncols))
    return np.loadtxt(io.StringIO(body), dtype=np.float64, ndmin=2)


def _count_data_lines(path) -> int:
    """Upper bound on entries: lines after the header."""
    with open(path, "rb") as fh:
        data = fh.read()
    return max(data.count(b"\n"), 1)


def _native_read_triplets(path):
    """Native parse of an IJ matrix body; None if unavailable."""
    from tpusolve.native import get_lib
    import ctypes
    lib = get_lib()
    if lib is None:
        return None
    cap = _count_data_lines(path)
    rows = np.empty(cap, np.int64)
    cols = np.empty(cap, np.int64)
    vals = np.empty(cap, np.float64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    got = lib.fastio_parse_triplets(
        str(path).encode(), 1, 3, cap,
        rows.ctypes.data_as(i64p), cols.ctypes.data_as(i64p),
        vals.ctypes.data_as(f64p), None)
    if got < 0:
        return None
    return rows[:got], cols[:got], vals[:got]


def _native_read_pairs(path):
    from tpusolve.native import get_lib
    import ctypes
    lib = get_lib()
    if lib is None:
        return None
    cap = _count_data_lines(path)
    idx = np.empty(cap, np.int64)
    vals = np.empty(cap, np.float64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    got = lib.fastio_parse_pairs(
        str(path).encode(), 1, cap,
        idx.ctypes.data_as(i64p), vals.ctypes.data_as(f64p))
    if got < 0:
        return None
    return idx[:got], vals[:got]


def read_matrix(prefix: str, nfiles: int, row_range: tuple[int, int] | None = None):
    """Read all partitions → COO (rows, cols, vals).

    ``row_range=(lo, hi)`` keeps only rows in the inclusive range, mirroring
    the reference's overlap-filtered read (src/HypreSystem.cpp:1219-1236).
    """
    all_r, all_c, all_v = [], [], []
    for p in range(nfiles):
        path = part_path(prefix, p)
        if not os.path.exists(path):
            raise FileNotFoundError(f"Cannot open matrix file: {path}")
        with open(path) as fh:
            ilower, iupper, _, _ = (int(x) for x in fh.readline().split())
            if row_range is not None:
                lo, hi = row_range
                overlap = max(0, min(hi + 1, iupper + 1) - max(lo, ilower))
                if not overlap:
                    continue
            native = _native_read_triplets(path)
            if native is not None:
                r, c, v = native
            else:
                raw = _read_body(fh, 3)
                r = raw[:, 0].astype(np.int64)
                c = raw[:, 1].astype(np.int64)
                v = raw[:, 2]
        if row_range is not None:
            keep = (r >= row_range[0]) & (r <= row_range[1])
            r, c, v = r[keep], c[keep], v[keep]
        all_r.append(r)
        all_c.append(c)
        all_v.append(v)
    if not all_r:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float64))
    return (np.concatenate(all_r), np.concatenate(all_c),
            np.concatenate(all_v))


def read_vector(prefix: str, nfiles: int, row_range: tuple[int, int] | None = None):
    """Read all vector partitions → (indices, values)."""
    all_i, all_v = [], []
    for p in range(nfiles):
        path = part_path(prefix, p)
        if not os.path.exists(path):
            raise FileNotFoundError(f"Cannot open vector file: {path}")
        with open(path) as fh:
            ilower, iupper = (int(x) for x in fh.readline().split())
            if row_range is not None:
                lo, hi = row_range
                overlap = max(0, min(hi + 1, iupper + 1) - max(lo, ilower))
                if not overlap:
                    continue
            native = _native_read_pairs(path)
            if native is not None:
                i, v = native
            else:
                raw = _read_body(fh, 2)
                i = raw[:, 0].astype(np.int64)
                v = raw[:, 1]
        if row_range is not None:
            keep = (i >= row_range[0]) & (i <= row_range[1])
            i, v = i[keep], v[keep]
        all_i.append(i)
        all_v.append(v)
    if not all_i:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    return np.concatenate(all_i), np.concatenate(all_v)


def read_dense_vector(prefix: str, nfiles: int, n: int | None = None,
                      row_range: tuple[int, int] | None = None):
    """Read a vector into a dense array indexed by global row (zeros
    outside ``row_range`` when sharded reading is in effect)."""
    idx, vals = read_vector(prefix, nfiles, row_range=row_range)
    if n is None:
        n = int(idx.max()) + 1 if idx.size else 0
    out = np.zeros(n, np.float64)
    out[idx] = vals
    return out


def write_matrix(prefix: str, rows, cols, vals, offsets, ncols: int | None = None):
    """Write COO partitioned by the row decomposition ``offsets``
    (nparts+1 entries).  One file per part, reference header + entries sorted
    by (row, col)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    nparts = len(offsets) - 1
    n = int(offsets[-1])
    ncols = n if ncols is None else ncols
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    starts = np.searchsorted(rows, np.asarray(offsets[:-1]))
    ends = np.searchsorted(rows, np.asarray(offsets[1:]))
    for p in range(nparts):
        lo, hi = int(offsets[p]), int(offsets[p + 1]) - 1
        with open(part_path(prefix, p), "w") as fh:
            fh.write(f"{lo} {hi} 0 {ncols - 1}\n")
            s, e = starts[p], ends[p]
            for r, c, v in zip(rows[s:e], cols[s:e], vals[s:e]):
                fh.write(f"{r} {c} {v:.15e}\n")


def write_vector(prefix: str, vec, offsets):
    """Write a dense vector partitioned by ``offsets``."""
    vec = np.asarray(vec)
    nparts = len(offsets) - 1
    for p in range(nparts):
        lo, hi = int(offsets[p]), int(offsets[p + 1]) - 1
        with open(part_path(prefix, p), "w") as fh:
            fh.write(f"{lo} {hi}\n")
            for i in range(lo, hi + 1):
                fh.write(f"{i} {vec[i]:.15e}\n")
