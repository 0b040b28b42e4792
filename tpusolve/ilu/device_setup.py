"""Device-side ILU(0) setup for DIA-layout operators.

TPU-native analog of the reference's iterative (rocSPARSE-style) ILU0
setup — the ``ilu_iterative_setup_*`` knobs at src/HypreSystem.cpp:352-361
configure exactly this algorithm: Chow-Patel fixed-point sweeps, each one
sparse product + elementwise update.  On a DIA-layout operator the masked
product (L@U)|pattern collapses to a STATIC set of shifted plane
multiply-adds in box space — no gathers, no sorts, no dynamic shapes, so
every sweep is a single fused HBM-bandwidth pass (the same structural trick
as the DIA SpMV, matrix/spmv.py:79).

Multi-part operators factor their diagonal blocks independently
(block-Jacobi ILU): hypre's parallel ILU likewise factors each rank's
local diagonal block, so cross-part entries never enter the factors.
The per-part sweeps are one vmapped program — SPMD with zero collectives.

Pattern note: the stored DIA band IS the ILU(0) pattern here (each kept
diagonal is dense over the box, zero-filled at box edges), a pattern
superset of the host CSR path's stored-nonzeros pattern.  The parity tests
(tests/test_ilu_device.py) compare against the host Chow-Patel
factorization on the identical band pattern.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpusolve.matrix.sharded import ShardedMatrix
from tpusolve.matrix.spmv import _decompose_offset

MIN_DEVICE_N = 1 << 16


MAX_ELL_K = 128


def eligible(A: ShardedMatrix, cfg) -> bool:
    """Device ILU covers ILU(0) on DIA-layout operators (stencil class:
    static shifted-plane sweeps) AND generic padded-ELL operators (the
    file-loaded momentum class: masked-product sweeps).  ILU(k>0), ILUT
    drop/cap and RCM reordering change the pattern — those stay on the
    host pipeline."""
    return _device_path(A, cfg) is not None


def _device_path(A: ShardedMatrix, cfg):
    """'dia' | 'ell' | None — which device factorizer applies."""
    if os.environ.get("TPUSOLVE_ILU_DEVICE", "1") == "0":
        return None
    if cfg.ilu_type != 0 or cfg.ilu_fill_level != 0:
        return None
    if cfg.ilu_local_reordering:
        return None
    n = A.shape[0]
    if n < int(os.environ.get("TPUSOLVE_ILU_DEVICE_MIN_N", MIN_DEVICE_N)):
        return None
    if A.uses_dia and A.dia_offsets is not None:
        offs = A.dia_offsets
        if 0 in offs and any(o < 0 for o in offs) \
                and any(o > 0 for o in offs):
            return "dia"
        return None
    # generic ELL diag block (the unstructured/file-loaded class, ref
    # device ILU on arbitrary ParCSR: src/HypreSystem.cpp:328-370)
    if not (A.uses_bell or A.uses_bdia) and A.diag_vals is not None:
        if A.diag_vals.shape[-1] <= MAX_ELL_K:
            return "ell"
    return None


def _valid_mask(dec, dims):
    """Boolean (*dims) mask: cell + dec stays inside the box (the positions
    where the diagonal `dec` has a matrix entry).  Pure iota comparisons —
    XLA fuses them, nothing materializes."""
    m = jnp.bool_(True)
    for ax, (c, d) in enumerate(zip(dec, dims)):
        ar = lax.broadcasted_iota(jnp.int32, tuple(dims), ax)
        m = m & (ar >= max(0, -c)) & (ar < d - max(0, c))
    return m


def _shift(a, dec, fill):
    """a evaluated at cell + dec (static pad+slice, like dia_spmv_local);
    out-of-box reads return ``fill``."""
    dims = a.shape
    pads = [(max(0, -c), max(0, c)) for c in dec]
    ap = jnp.pad(a, pads, constant_values=fill)
    start = tuple(p[0] + c for p, c in zip(pads, dec))
    return lax.slice(ap, start, tuple(s + d for s, d in zip(start, dims)))


def make_factorizer(offsets, dims, sweeps):
    """Build a jittable single-part factorizer for the static (offsets,
    box) plan.  Returns (factor, l_offsets, u_strict_offsets) where
    ``factor(dia) -> (l_planes, u_strict_planes, udiag_inv)`` runs the
    Chow-Patel sweeps (host-formula match: ilu.chow_patel_ilu)."""
    offsets = tuple(int(o) for o in offsets)
    dims = tuple(int(d) for d in dims)
    decs = [_decompose_offset(o, dims) for o in offsets]
    low = [k for k, o in enumerate(offsets) if o < 0]
    upp = [k for k, o in enumerate(offsets) if o >= 0]   # includes diag
    k0 = offsets.index(0)
    li = {k: i for i, k in enumerate(low)}
    ui = {k: i for i, k in enumerate(upp)}
    dec_index = {decs[k]: k for k in range(len(offsets))}
    # product terms: l_{d1}(c) * u_{d2}(c + d1) lands on plane d1 + d2
    # (componentwise in box space) — entries outside the band are dropped,
    # which IS the restrict-to-pattern of the host formulation
    pairs: dict[int, list] = {}
    for k1 in low:
        for k2 in upp:
            s = tuple(a + b for a, b in zip(decs[k1], decs[k2]))
            k_out = dec_index.get(s)
            if k_out is not None:
                pairs.setdefault(k_out, []).append(
                    (li[k1], ui[k2], decs[k1]))

    # one shared pad width per axis: the u stack is padded ONCE per sweep
    # and every product term is a static slice of it (smaller HLO — remote
    # TPU compile cost scales with op count)
    stack_pads = [max([1] + [abs(d[ax]) for d in decs])
                  for ax in range(len(dims))]

    def factor(dia):
        a = dia.reshape((len(offsets),) + dims)
        dtype = a.dtype
        one = jnp.asarray(1.0, dtype)
        vmask = [_valid_mask(decs[k], dims) for k in range(len(offsets))]
        d0 = a[k0]
        d0s = jnp.where(d0 != 0, d0, one)
        # init: l_ij = a_ij / a_jj ; u_ij = a_ij   (ilu.chow_patel_ilu:77)
        l = jnp.stack([jnp.where(vmask[k],
                                 a[k] / _shift(d0s, decs[k], 1.0), 0)
                       for k in low])
        u = jnp.stack([jnp.where(vmask[k], a[k], 0) for k in upp])

        def _stack_slice(up_pad, plane, dec):
            start = (plane,) + tuple(p + c
                                     for p, c in zip(stack_pads, dec))
            lim = (plane + 1,) + tuple(s + d for s, d in
                                       zip(start[1:], dims))
            return lax.slice(up_pad, start, lim).reshape(dims)

        def body(_, lu):
            l, u = lu
            ujj = u[ui[k0]]
            ujj = jnp.where(ujj != 0, ujj, one)
            up = jnp.pad(u, [(0, 0)] + [(p, p) for p in stack_pads])
            ujp = jnp.pad(ujj, [(p, p) for p in stack_pads],
                          constant_values=1)[None]
            newl, newu = [], []
            for k in range(len(offsets)):
                p = jnp.zeros(dims, dtype)
                for (lpi, upi, dec1) in pairs.get(k, ()):
                    p = p + l[lpi] * _stack_slice(up, upi, dec1)
                if k in li:
                    # l_ij = (a_ij - (p_ij - l_ij u_jj)) / u_jj
                    ujs = _stack_slice(ujp, 0, decs[k])
                    newl.append(jnp.where(
                        vmask[k], (a[k] - p + l[li[k]] * ujs) / ujs, 0))
                else:
                    # u_ij = a_ij - p_ij  (p excludes k=i: L is strict)
                    newu.append(jnp.where(vmask[k], a[k] - p, 0))
            return jnp.stack(newl), jnp.stack(newu)

        l, u = lax.fori_loop(0, sweeps, body, (l, u))
        ujj = u[ui[k0]]
        dinv = one / jnp.where(ujj != 0, ujj, one)
        u_strict = jnp.stack([u[ui[k]] for k in upp if k != k0])
        R = int(np.prod(dims))
        return (l.reshape(len(low), R), u_strict.reshape(len(upp) - 1, R),
                dinv.reshape(R))

    l_offs = tuple(offsets[k] for k in low)
    u_offs = tuple(offsets[k] for k in upp if k != k0)
    return factor, l_offs, u_offs


# ----------------------------------------------------------------------
# generic-ELL Chow-Patel sweeps (unstructured diagonal blocks)
#
# Same fixed-point iteration as the DIA path, on an arbitrary sparsity
# pattern: the masked product (L@U)|pattern reuses the compare-count /
# one-hot-contraction machinery of the generic-ELL AMG setup
# (amg/device_setup_ell.py) — per row i, each strict-lower neighbor k's
# packed U row is rank-matched against row i's column-sorted pattern and
# accumulated scatter-free through an einsum one-hot.  The pattern is
# static across sweeps, so slot packs are computed once; sweeps, row
# chunks and lower-slot probes are nested lax.fori_loops — ONE compile
# regardless of size.

_I32_MAX = np.int32(2**31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


def make_ell_factorizer(R, K, sweeps, KL, KU, budget=1 << 27):
    """Jittable per-part factorizer for a padded-ELL diagonal block.

    ``factor(vals, cols) -> (Lv, Lc, Uv, Uc, dinv)``: strict-lower /
    strict-upper ELL factors (left-packed, local cols, widths KL / KU)
    plus 1/u_ii — host-formula match: ilu.chow_patel_ilu."""
    KL = max(1, int(KL))
    KU = max(1, int(KU))
    itemsize = 4
    chunk = max(256, min(R, budget // max(K * KU * itemsize, 1)))
    chunk = _round_up(chunk, 256)
    nch = (R + chunk - 1) // chunk
    pad_to = nch * chunk
    INF = jnp.int32(_I32_MAX)

    def _pack(valsK, colsK, mask, Ksel):
        """Left-pack masked slots; dead slots val 0 / col 0."""
        kidx = jnp.arange(K, dtype=jnp.int32)[None, :]
        key = jnp.where(mask, kidx, jnp.int32(K))
        key_s, v_s, c_s = lax.sort(
            (jnp.broadcast_to(key, valsK.shape), valsK, colsK),
            dimension=1, num_keys=1)
        live = key_s < K
        return (jnp.where(live, v_s, 0.0)[:, :Ksel],
                jnp.where(live, c_s, 0)[:, :Ksel],
                jnp.where(live, key_s, 0)[:, :Ksel], live[:, :Ksel])

    def factor(vals, cols):
        dtype = vals.dtype
        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        live = vals != 0
        key = jnp.where(live, cols, INF)
        key_s, v_s = lax.sort((key, vals), dimension=1, num_keys=1)
        live_s = key_s < INF
        colsafe = jnp.where(live_s, key_s, 0)
        lower = live_s & (key_s < rows)
        diagm = live_s & (key_s == rows)
        upper = live_s & (key_s >= rows)          # includes diagonal

        d0 = jnp.sum(jnp.where(diagm, v_s, 0.0), axis=1)
        d0s = jnp.where(d0 != 0, d0, 1.0)
        lv0 = jnp.where(lower, v_s / d0s[colsafe], 0.0)
        uv0 = jnp.where(upper, v_s, 0.0)

        # static slot packs (the PATTERN never changes across sweeps)
        _, lcols, lslot, lmask = _pack(v_s, colsafe, lower, KL)
        _, ucols, uslot, umask = _pack(v_s, colsafe, upper, KU)

        def sweep(_, lu):
            lv, uv = lu
            ujj = jnp.sum(jnp.where(diagm, uv, 0.0), axis=1)
            ujjs = jnp.where(ujj != 0, ujj, 1.0)
            lpv = jnp.where(lmask,
                            jnp.take_along_axis(lv, lslot, axis=1), 0.0)
            upv = jnp.where(umask,
                            jnp.take_along_axis(uv, uslot, axis=1), 0.0)

            def _padr(a):
                return a if pad_to == R else jnp.pad(
                    a, ((0, pad_to - R),) + ((0, 0),) * (a.ndim - 1))

            # rank-match against key_s (INF on dead slots): colsafe's
            # zeroed dead slots would corrupt the compare-count ranks
            lpv_p, lcols_p, key_p = (_padr(lpv), _padr(lcols),
                                     _padr(key_s))

            def chunk_body(c, p_all):
                lpc = lax.dynamic_slice(lpv_p, (c * chunk, 0),
                                        (chunk, KL))
                lcc = lax.dynamic_slice(lcols_p, (c * chunk, 0),
                                        (chunk, KL))
                keyc = lax.dynamic_slice(key_p, (c * chunk, 0),
                                         (chunk, K))

                def t_body(t, p):
                    k = lcc[:, t]
                    bu = upv[k]                           # (chunk, KU)
                    bc = ucols[k]
                    s = jnp.sum((keyc[:, None, :] < bc[:, :, None])
                                .astype(jnp.int32), axis=2)
                    cand = jnp.take_along_axis(
                        keyc, jnp.minimum(s, K - 1), axis=1)
                    member = (cand == bc) & (s < K) & (bu != 0)
                    onehot = (jnp.where(member, s, K)[:, :, None]
                              == jnp.arange(K, dtype=jnp.int32)[None,
                                                                None, :])
                    contrib = lpc[:, t][:, None] * jnp.where(member, bu,
                                                             0.0)
                    return p + jnp.einsum("ck,cks->cs", contrib,
                                          onehot.astype(dtype))

                p_c = lax.fori_loop(0, KL, t_body,
                                    jnp.zeros((chunk, K), dtype))
                return lax.dynamic_update_slice(p_all, p_c,
                                                (c * chunk, 0))

            p = lax.fori_loop(0, nch, chunk_body,
                              jnp.zeros((pad_to, K), dtype))[:R]
            # i > j:  l_ij = (a_ij - (p_ij - l_ij u_jj)) / u_jj
            new_l = jnp.where(
                lower, (v_s - p + lv * ujjs[colsafe]) / ujjs[colsafe],
                0.0)
            # i <= j: u_ij = a_ij - p_ij   (p excludes k=i: L is strict)
            new_u = jnp.where(upper, v_s - p, 0.0)
            return new_l, new_u

        lv, uv = lax.fori_loop(0, sweeps, sweep, (lv0, uv0))
        ujj = jnp.sum(jnp.where(diagm, uv, 0.0), axis=1)
        dinv = 1.0 / jnp.where(ujj != 0, ujj, 1.0)
        Lv, Lc, _, _ = _pack(lv, colsafe, lower & (lv != 0), KL)
        Uv, Uc, _, _ = _pack(uv, colsafe, upper & ~diagm & (uv != 0), KU)
        return Lv, Lc, Uv, Uc, dinv

    return factor


def _ilu_widths(A: ShardedMatrix):
    """(KL, KU) static pack widths: max strict-lower / upper-incl-diag
    slot counts over all parts (one tiny fetch)."""
    @jax.jit
    def widths(vals, cols):
        Pn, R, K = vals.shape
        rows = jnp.arange(R, dtype=jnp.int32)[None, :, None]
        live = vals != 0
        low = live & (cols < rows)
        up = live & (cols >= rows)
        return (jnp.max(jnp.sum(low, axis=-1)),
                jnp.max(jnp.sum(up, axis=-1)))

    kl, ku = widths(A.diag_vals, A.diag_cols)
    return int(kl), int(ku)


def ilu_setup_device_ell(A: ShardedMatrix, cfg):
    """Factor A's generic-ELL diagonal block(s) on device (block-Jacobi
    across parts) — the unstructured analog of ilu_setup_device; no
    global host CSR at any scale.  Ref: device ILU on arbitrary ParCSR,
    src/HypreSystem.cpp:328-370."""
    from tpusolve.ilu.ilu import ILUPreconditioner, ilu_apply

    mesh = A.mesh
    nparts = A.nparts
    _, R, K = A.diag_vals.shape
    sweeps = max(cfg.ilu_iterative_setup_max_iter, 1) * 5
    KL, KU = _ilu_widths(A)
    factor = make_ell_factorizer(R, K, sweeps, KL, KU)

    shard = NamedSharding(mesh, P(A.axis))
    fac = jax.jit(jax.vmap(factor), out_shardings=(shard,) * 5)
    Lv, Lc, Uv, Uc, dinv = fac(A.diag_vals, A.diag_cols)

    ro = np.asarray(A.row_offsets, np.int64)
    co = np.asarray(A.col_offsets, np.int64)
    co_d = jax.device_put(
        co[:-1].reshape(nparts, 1, 1),
        NamedSharding(mesh, P(A.axis))) if nparts > 1 else None

    @jax.jit
    def _glob(v, c):
        if co_d is None:
            return c
        return jnp.where(v != 0, c + co_d.astype(jnp.int32), 0)

    L = ShardedMatrix.from_device_ell_parts(
        mesh, A.shape, Lv, _glob(Lv, Lc), row_offsets=ro, col_offsets=co,
        axis=A.axis)
    U = ShardedMatrix.from_device_ell_parts(
        mesh, A.shape, Uv, _glob(Uv, Uc), row_offsets=ro, col_offsets=co,
        axis=A.axis)
    udiag_inv = jax.jit(lambda d: d.reshape(-1), out_shardings=shard)(dinv)

    notes = ["ILU(0) setup on device (generic-ELL Chow-Patel, "
             f"{sweeps} sweeps; ref src/HypreSystem.cpp:352-361)"]
    if nparts > 1:
        notes.append("multi-part: block-Jacobi ILU (per-part diagonal "
                     "blocks, hypre parallel-ILU semantics)")
    if A.has_offd:
        notes.append("off-part couplings excluded from the factors "
                     "(block-Jacobi)")

    pre = ILUPreconditioner(L=L, U=U, udiag_inv=udiag_inv,
                            lower_iters=max(cfg.ilu_lower_jacobi_iters, 1),
                            upper_iters=max(cfg.ilu_upper_jacobi_iters, 1),
                            notes=notes, _A=A)
    nl, nu = pre.lower_iters, pre.upper_iters

    def apply_fn(state, r):
        L, U, dinv = state
        return ilu_apply(L, U, dinv, r, nl, nu)

    pre._apply_fn = apply_fn
    applyj = jax.jit(apply_fn)
    pre._apply = lambda r: applyj((pre.L, pre.U, pre.udiag_inv), r)
    return pre


def ilu_setup_device(A: ShardedMatrix, cfg):
    """Factor A's diagonal block(s) on device; wrap as ILUPreconditioner
    with DIA-layout L/U (the Jacobi trisolves then run the lane-aligned
    DIA SpMV).  Ref: device ILU setup+solve src/HypreSystem.cpp:328-370."""
    from tpusolve.ilu.ilu import ILUPreconditioner, ilu_apply

    mesh = A.mesh
    dims = A.dia_shape if A.dia_shape is not None else (A.row_pad,)
    sweeps = max(cfg.ilu_iterative_setup_max_iter, 1) * 5
    factor, l_offs, u_offs = make_factorizer(A.dia_offsets, dims, sweeps)

    shard = NamedSharding(mesh, P(A.axis))
    fac = jax.jit(jax.vmap(factor),
                  out_shardings=(shard, shard, shard))
    l_planes, u_planes, dinv = fac(A.dia_vals)

    nparts = A.nparts
    ro = np.asarray(A.row_offsets, np.int64)
    co = np.asarray(A.col_offsets, np.int64)
    empty = [(np.zeros(0, np.int64), np.zeros(0, np.int64),
              np.zeros(0, A.dtype))] * nparts
    mk = partial(ShardedMatrix.from_dia_parts, mesh, A.shape,
                 dtype=A.dtype, row_offsets=ro, col_offsets=co,
                 axis=A.axis, dia_shape=A.dia_shape)
    L = mk(l_offs, l_planes, empty)
    U = mk(u_offs, u_planes, empty)
    udiag_inv = jax.jit(lambda d: d.reshape(-1), out_shardings=shard)(dinv)

    notes = ["ILU(0) setup on device (DIA Chow-Patel, "
             f"{sweeps} sweeps; ref src/HypreSystem.cpp:352-361)"]
    if nparts > 1:
        notes.append("multi-part: block-Jacobi ILU (per-part diagonal "
                     "blocks, hypre parallel-ILU semantics)")
    if A.has_offd:
        notes.append("off-part couplings excluded from the factors "
                     "(block-Jacobi)")

    pre = ILUPreconditioner(L=L, U=U, udiag_inv=udiag_inv,
                            lower_iters=max(cfg.ilu_lower_jacobi_iters, 1),
                            upper_iters=max(cfg.ilu_upper_jacobi_iters, 1),
                            notes=notes, _A=A)
    nl, nu = pre.lower_iters, pre.upper_iters

    def apply_fn(state, r):
        L, U, dinv = state
        return ilu_apply(L, U, dinv, r, nl, nu)

    pre._apply_fn = apply_fn
    applyj = jax.jit(apply_fn)
    pre._apply = lambda r: applyj((pre.L, pre.U, pre.udiag_inv), r)
    return pre
