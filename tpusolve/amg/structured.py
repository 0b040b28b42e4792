"""PFMG-style structured multigrid for box-generated operators.

HYPRE answers structured problems with its Struct/PFMG solvers rather than
BoomerAMG; this module is the TPU-native analog for operators produced by
the stencil generator (``A.dia_shape`` of rank 3):

* **geometric coarsening**: each device's box halves per dim (domain-
  decomposed — coarsening is local to the device, so the transfer operators
  are block-diagonal and need no communication);
* **transfers**: cell-centered linear interpolation applied as pure
  reshape/slice box ops under ``shard_map`` (no sparse matrices, no
  gathers — the restriction is the exact adjoint of the prolongation);
* **Galerkin coarse operators**: host RAP (exact), re-assembled as
  box-consistent DIA matrices, so *every* level's SpMV runs at the
  speed-of-light path;
* smoothers/coarse solve shared with the algebraic builder.

Convergence note: domain-decomposed coarsening with clamped near-boundary
interpolation gives slightly weaker seams than global PFMG; the Krylov wrap
absorbs it.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpusolve.config import BoomerAMGConfig
from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.spmv import shard_map
from tpusolve.mesh import row_decomposition
from jax.sharding import PartitionSpec as P

from tpusolve.amg import smoothers
from tpusolve.amg import galerkin
from tpusolve.amg.builder import (
    Level, AMGPreconditioner, _make_level, _padded_pinv, _build_cycle,
    _resolve_kinds)


# ----------------------------------------------------------------------
# host-side transfer operator (for Galerkin RAP only)
def _p1d(m: int) -> sp.csr_matrix:
    """1-D cell-centered interpolation (m fine cells <- m//2 coarse cells):
    fine 2c   <- .75 c + .25 (c-1, clamped)
    fine 2c+1 <- .75 c + .25 (c+1, clamped)"""
    mc = m // 2
    rows, cols, vals = [], [], []
    c = np.arange(mc)
    rows.append(2 * c); cols.append(c); vals.append(np.full(mc, 0.75))
    rows.append(2 * c); cols.append(np.maximum(c - 1, 0)); vals.append(np.full(mc, 0.25))
    rows.append(2 * c + 1); cols.append(c); vals.append(np.full(mc, 0.75))
    rows.append(2 * c + 1); cols.append(np.minimum(c + 1, mc - 1)); vals.append(np.full(mc, 0.25))
    Pm = sp.csr_matrix((np.concatenate(vals),
                        (np.concatenate(rows), np.concatenate(cols))),
                       shape=(m, mc))
    Pm.sum_duplicates()
    return Pm


def _p_box(box: tuple) -> sp.csr_matrix:
    """Per-device interpolation for an (nz, ny, nx) box, x-fastest order."""
    nz, ny, nx = box
    return sp.kron(sp.kron(_p1d(nz), _p1d(ny)), _p1d(nx)).tocsr()


# ----------------------------------------------------------------------
# device-side transfers (shard_map over local boxes)
def _interleave(even, odd, axis):
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _clamp_shift(a, axis, direction):
    """shift by one with edge clamp: direction -1 -> a[i-1], +1 -> a[i+1]."""
    n = a.shape[axis]
    if direction < 0:
        first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        rest = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
        return jnp.concatenate([first, rest], axis=axis)
    last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
    rest = jax.lax.slice_in_dim(a, 1, n, axis=axis)
    return jnp.concatenate([rest, last], axis=axis)


def _up1(a, axis):
    even = 0.75 * a + 0.25 * _clamp_shift(a, axis, -1)
    odd = 0.75 * a + 0.25 * _clamp_shift(a, axis, +1)
    return _interleave(even, odd, axis)


def _down1(r, axis):
    """Exact adjoint of _up1 along axis (fine size even)."""
    n = r.shape[axis]
    even = jax.lax.slice_in_dim(r, 0, n, stride=2, axis=axis)
    odd = jax.lax.slice_in_dim(r, 1, n, stride=2, axis=axis)
    mc = even.shape[axis]
    e_first = jax.lax.slice_in_dim(even, 0, 1, axis=axis)
    o_prev = jax.lax.slice_in_dim(odd, 0, mc - 1, axis=axis)
    t1 = jnp.concatenate([e_first, o_prev], axis=axis)        # r[2c-1] | clamp
    e_next = jax.lax.slice_in_dim(even, 1, mc, axis=axis)
    o_last = jax.lax.slice_in_dim(odd, mc - 1, mc, axis=axis)
    t2 = jnp.concatenate([e_next, o_last], axis=axis)         # r[2c+2] | clamp
    return 0.75 * (even + odd) + 0.25 * t1 + 0.25 * t2


def _prolong_local(fine_box, coarse_box, xc):
    a = xc.reshape(coarse_box)
    for axis in range(3):
        a = _up1(a, axis)
    return a.reshape(-1)


def _restrict_local(fine_box, coarse_box, rf):
    a = rf.reshape(fine_box)
    for axis in range(3):
        a = _down1(a, axis)
    return a.reshape(-1)


def _make_transfers(mesh, axis, fine_box, coarse_box):
    spec = P(axis)
    prolong = shard_map(partial(_prolong_local, fine_box, coarse_box),
                        mesh=mesh, in_specs=(spec,), out_specs=spec)
    restrict = shard_map(partial(_restrict_local, fine_box, coarse_box),
                         mesh=mesh, in_specs=(spec,), out_specs=spec)
    return prolong, restrict


# ----------------------------------------------------------------------
def structured_possible(A: ShardedMatrix) -> bool:
    return (A.uses_dia and A.dia_shape is not None
            and len(A.dia_shape) == 3
            and all(d % 2 == 0 and d >= 4 for d in A.dia_shape))


def structured_mg_setup(A: ShardedMatrix,
                        config: BoomerAMGConfig | None = None, *,
                        A_host: sp.csr_matrix | None = None
                        ) -> AMGPreconditioner:
    """Build the structured (PFMG-analog) hierarchy for a box operator."""
    cfg = config or BoomerAMGConfig()
    if not structured_possible(A):
        raise ValueError("structured multigrid requires a rank-3 dia_shape "
                         "with even dims >= 4")
    mesh = A.mesh
    dtype = A.dtype
    nparts = A.nparts
    notes = ["structured (PFMG-style) geometric hierarchy"]

    kind_down, kind_up, knotes = _resolve_kinds(cfg)
    notes += knotes

    Ah = (A_host if A_host is not None else A.to_scipy()).tocsr()
    Ah.sum_duplicates()

    box = tuple(A.dia_shape)
    A_sh = A
    levels: list[Level] = []
    max_coarse = max(cfg.max_coarse_size, 1)

    for lvl in range(cfg.max_levels):
        n = Ah.shape[0]
        can_coarsen = all(d % 2 == 0 and d >= 4 for d in box)
        if n <= max_coarse or lvl == cfg.max_levels - 1 or not can_coarsen:
            break
        coarse_box = tuple(d // 2 for d in box)
        P_box = _p_box(box)
        P_host = sp.block_diag([P_box] * nparts, format="csr")
        Ac = galerkin.rap(Ah, P_host)
        if cfg.non_galerkin_tol > 0:
            Ac = galerkin.nongalerkin_sparsify(Ac, cfg.non_galerkin_tol)

        lev = _make_level(mesh, A_sh, Ah, dtype, kind_down, kind_up, cfg)
        lev.prolong, lev.restrict = _make_transfers(
            mesh, A.axis, box, coarse_box)
        levels.append(lev)

        # coarse operator: DIA with the coarse box shape (box-consistent by
        # the same locality argument as the fine level)
        nc = Ac.shape[0]
        Acoo = Ac.tocoo()
        A_sh = ShardedMatrix.from_coo(
            mesh, (nc, nc), Acoo.row.astype(np.int64),
            Acoo.col.astype(np.int64), Acoo.data, dtype=dtype,
            row_offsets=row_decomposition(nc, nparts),
            dia_shape=coarse_box)
        Ah = Ac
        box = coarse_box

    lev = _make_level(mesh, A_sh, Ah, dtype, kind_down, kind_up, cfg)
    levels.append(lev)
    coarse_inv = _padded_pinv(mesh, Ah, A_sh, dtype)

    pre = AMGPreconditioner(levels=levels, coarse_inv=coarse_inv, config=cfg,
                            notes=notes, num_levels=len(levels))
    pre._cycle_fn = _build_cycle(pre, kind_down, kind_up, cfg)
    return pre
