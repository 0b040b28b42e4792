"""27-point 3-D Laplacian weak-scaling generator.

TPU-native rebuild of the reference's HIP-only generator
(``build_27pt_stencil``, ref: src/HypreSystem.cpp:1323-1608, device kernels
in src/laplace_3d_weak_scaling.hpp:171-602): each part owns an
``nx x ny x nz`` box of the global ``(px*nx) x (py*ny) x (pz*nz)`` grid
(per-rank 128^3 default, ref: src/HypreSystem.cpp:1487-1489), the process
grid comes from prime factorization (ref: hpp:98-169), the matrix is the
27-point Laplacian with diagonal 26 and off-diagonal -1, and the RHS is
``26 - (row_nnz - 1)`` (ref: hpp:321) so the exact solution is x = 1
everywhere — the built-in determinism fixture.

Global row ordering is block-by-part (each part owns a contiguous row range,
matching the reference's iLower/iUpper contract), with x-fastest
lexicographic order inside each box.  Generation is vectorized NumPy per
part feeding ``ShardedMatrix.from_local_parts`` — entries never materialize
as a global COO, and the halo plan (the reference's hand-built
``kernel_setup_halo`` machinery, hpp:412-602) falls out of the generic
ghost-column analysis.
"""

from __future__ import annotations

import numpy as np

from tpusolve.mesh import ROWS_AXIS, compute_3d_process_distribution
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.vectors import to_device_vector

_OFFSETS = np.array([(dx, dy, dz)
                     for dz in (-1, 0, 1)
                     for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1)], dtype=np.int64)  # (27, 3)


def part_to_grid(part: int, pgrid: tuple[int, int, int]) -> tuple[int, int, int]:
    px, py, pz = pgrid
    return part % px, (part // px) % py, part // (px * py)


def _local_part(part, nx, ny, nz, pgrid, dtype):
    """Entries + rhs for one part: (local_rows, global_cols, vals), rhs."""
    px, py, pz = pgrid
    ipx, ipy, ipz = part_to_grid(part, pgrid)
    box = nx * ny * nz
    gx_max, gy_max, gz_max = px * nx, py * ny, pz * nz

    i = np.arange(nx, dtype=np.int64)
    j = np.arange(ny, dtype=np.int64)
    k = np.arange(nz, dtype=np.int64)
    # x fastest: lrow = k*(nx*ny) + j*nx + i
    gx = (ipx * nx + i)[None, None, :]
    gy = (ipy * ny + j)[None, :, None]
    gz = (ipz * nz + k)[:, None, None]
    lrow = (k[:, None, None] * (ny * nx) + j[None, :, None] * nx
            + i[None, None, :]).reshape(-1)                    # (box,)

    ngx = gx + _OFFSETS[:, 0][:, None, None, None]             # (27,nz,ny,nx)
    ngy = gy + _OFFSETS[:, 1][:, None, None, None]
    ngz = gz + _OFFSETS[:, 2][:, None, None, None]
    valid = ((ngx >= 0) & (ngx < gx_max) & (ngy >= 0) & (ngy < gy_max)
             & (ngz >= 0) & (ngz < gz_max))
    full = (27, nz, ny, nx)
    ngx = np.broadcast_to(ngx, full).reshape(27, -1)
    ngy = np.broadcast_to(ngy, full).reshape(27, -1)
    ngz = np.broadcast_to(ngz, full).reshape(27, -1)
    valid = valid.reshape(27, -1)                              # (27, box)

    # owner part + local index of each neighbor -> global column
    opx, olx = np.divmod(ngx, nx)
    opy, oly = np.divmod(ngy, ny)
    opz, olz = np.divmod(ngz, nz)
    opart = opz * (px * py) + opy * px + opx
    ocol = opart * box + olz * (ny * nx) + oly * nx + olx

    is_center = (_OFFSETS == 0).all(axis=1)[:, None]           # (27, 1)
    vals = np.where(is_center, 26.0, -1.0)
    vals = np.broadcast_to(vals, (27, box))

    rows27 = np.broadcast_to(lrow[None, :], (27, box))
    sel = valid
    lr = rows27[sel]
    gc = ocol[sel]
    v = vals[sel].astype(dtype)

    order = np.lexsort((gc, lr))
    lr, gc, v = lr[order], gc[order], v[order]

    n_neighbors = valid.sum(axis=0) - 1                        # exclude center
    rhs = (26.0 - n_neighbors).astype(dtype)
    # rhs is indexed by lrow order; reorder to local-row order
    rhs_ordered = np.empty(box, dtype)
    rhs_ordered[lrow] = rhs
    return (lr, gc, v), rhs_ordered


def laplace27(mesh, nx: int = 128, ny: int = 128, nz: int = 128, *,
              dtype=np.float64, pgrid: tuple[int, int, int] | None = None,
              axis: str = ROWS_AXIS, with_host: bool = False):
    """Build the sharded 27-pt system on ``mesh``.

    Returns ``(A, b, x_ref)``: the sharded matrix, the padded sharded RHS,
    and the padded reference solution (all-ones), matching the reference's
    weak-scaling fixture where global rows = nx*ny*nz*nparts
    (ref: src/HypreSystem.cpp:1516).

    ``with_host=True`` appends the host CSR as a 4th return value — pass it
    to ``boomeramg_setup(..., A_host=...)`` to avoid a device->host gather
    of the operator during preconditioner setup.
    """
    nparts = mesh.devices.size
    if pgrid is None:
        pgrid = compute_3d_process_distribution(nparts)
    px, py, pz = pgrid
    if px * py * pz != nparts:
        raise ValueError(f"process grid {pgrid} != mesh size {nparts}")
    box = nx * ny * nz
    n = box * nparts

    parts, rhs_parts = [], []
    for part in range(nparts):
        p, rhs = _local_part(part, nx, ny, nz, pgrid, dtype)
        parts.append(p)
        rhs_parts.append(rhs)

    A = ShardedMatrix.from_local_parts(mesh, (n, n), parts, dtype=dtype,
                                       axis=axis)
    rhs_global = np.concatenate(rhs_parts)
    b = to_device_vector(mesh, rhs_global, A.row_offsets, A.row_pad,
                         dtype=dtype, axis=axis)
    x_ref = to_device_vector(mesh, np.ones(n, dtype), A.row_offsets,
                             A.row_pad, dtype=dtype, axis=axis)
    if with_host:
        import scipy.sparse as sp
        box = nx * ny * nz
        rows = np.concatenate([p[0] + q * box for q, p in enumerate(parts)])
        cols = np.concatenate([p[1] for p in parts])
        # setup math (strength/interp/RAP) runs in f64 on the host even when
        # the device operators are f32
        vals = np.concatenate([p[2] for p in parts]).astype(np.float64)
        A_host = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
        return A, b, x_ref, A_host
    return A, b, x_ref


def laplace27_scipy(nx, ny, nz, pgrid=(1, 1, 1)):
    """Host oracle: the same system as a scipy CSR + rhs (for tests)."""
    import scipy.sparse as sp
    nparts = int(np.prod(pgrid))
    rows, cols, vals, rhs_all = [], [], [], []
    box = nx * ny * nz
    for part in range(nparts):
        (lr, gc, v), rhs = _local_part(part, nx, ny, nz, pgrid, np.float64)
        rows.append(lr + part * box)
        cols.append(gc)
        vals.append(v)
        rhs_all.append(rhs)
    n = box * nparts
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return A, np.concatenate(rhs_all)
