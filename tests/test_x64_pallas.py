"""x64-mode tracing of the Pallas kernels.

The parity harness (tools/parity.py) enables ``jax_enable_x64`` globally —
including on TPU runs, where the f64 Krylov fixtures run on emulated f64
while the large f32 fixtures exercise the Pallas SpMV kernels.  Under x64,
python-int constants trace as i64: in BlockSpec index maps, fori_loop
bounds, and manual-DMA indices, Mosaic then fails to legalize the kernel
(``func.return (i32, i64)`` / ``tpu.memref_slice ... got 'i64'``).

These tests trace each kernel wrapper under x64 and assert that no i64
value reaches the kernel jaxpr or any index map — the CPU-side proxy for
"Mosaic can compile this" (regression: round-3 parity --tpu crash on the
128^3 fixture).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusolve.kernels import bdia, bell


def _pallas_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            yield eqn


def _assert_no_i64(jx):
    eqns = list(_pallas_eqns(jx.jaxpr))
    assert eqns, "expected a pallas_call in the traced jaxpr"
    for eqn in eqns:
        gm = eqn.params["grid_mapping"]
        for bm in gm.block_mappings:
            dts = [str(v.aval.dtype)
                   for v in bm.index_map_jaxpr.jaxpr.outvars]
            assert all(d == "int32" for d in dts), \
                f"index map returns {dts} (i64 breaks Mosaic)"
        kj = eqn.params["jaxpr"]
        bad = [str(v.aval) for e2 in kj.eqns
               for v in list(e2.invars) + list(e2.outvars)
               if getattr(getattr(v, "aval", None), "dtype", None)
               is not None and str(v.aval.dtype) in ("int64", "uint64")]
        assert not bad, f"i64 values inside the kernel jaxpr: {bad[:5]}"


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


class TestX64Tracing:
    def test_bdia_whole_x(self, x64):
        B, D, R = 16, 5, 256
        vals = jnp.zeros((B, D, R), jnp.float32)
        starts = jnp.zeros((B, D), jnp.int32)
        x = jnp.zeros((B * R,), jnp.float32)
        jx = jax.make_jaxpr(
            lambda v, s, xx: bdia.bdia_spmv_pallas(
                v, s, xx, 0, B * R, B * R))(vals, starts, x)
        _assert_no_i64(jx)

    def test_bdia_xl(self, x64):
        B, D, R = 16, 5, 256
        vals = jnp.zeros((B, D, R), jnp.float32)
        starts_np = (np.arange(B, dtype=np.int64)[:, None] * R
                     + np.arange(D)[None, :]).astype(np.int32)
        rowstart, pxrows, xrows_min = bdia.plan_panels(starts_np, R)
        xrows = max(xrows_min,
                    (B * R + bdia.LANE - 1) // bdia.LANE
                    + R // bdia.LANE + 1)
        x = jnp.zeros((B * R,), jnp.float32)
        jx = jax.make_jaxpr(
            lambda v, s, xx: bdia.bdia_spmv_pallas_xl(
                v, s, jnp.asarray(rowstart), pxrows, xrows, xx,
                0, B * R, B * R))(vals, jnp.asarray(starts_np), x)
        _assert_no_i64(jx)

    def test_bell(self, x64):
        G, K = 16, 4
        vals = jnp.zeros((G, K, 8, 128), jnp.float32)
        ids = jnp.zeros((G, K), jnp.int32)
        x = jnp.zeros((G * 8,), jnp.float32)
        jx = jax.make_jaxpr(
            lambda v, i, xx: bell.bell_spmv_pallas(
                v, i, xx, 8, G * 8))(vals, ids, x)
        _assert_no_i64(jx)
