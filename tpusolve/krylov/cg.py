"""Preconditioned conjugate gradients.

TPU-native replacement for ``HYPRE_ParCSRPCG*`` (consumed by the reference at
src/HypreSystem.cpp:440-455).  Jitted ``lax.while_loop``; the two dot products
per iteration become ``psum`` collectives over the mesh.

The operator and preconditioner state enter the jitted function as pytree
*arguments* (see ``as_operator_pair``) so GB-scale hierarchies are runtime
buffers, not HLO constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpusolve.krylov.common import (
    SolveResult, as_operator_pair, as_precond_pair, dot, norm, safe_div,
    stop_target, history_buffer)


def pcg_setup(A, M=None, *, tol: float = 1e-5, atol: float = 0.0,
              maxiter: int = 1000):
    """Build a jitted PCG solver closure for operator ``A`` and
    preconditioner ``M`` (z = M(r))."""
    afn, astate = as_operator_pair(A)
    mfn, mstate = as_precond_pair(M)

    @jax.jit
    def _solve(astate, mstate, b, x0):
        matvec = lambda x: afn(astate, x)
        precond = lambda r: mfn(mstate, r)
        x = jnp.zeros_like(b) if x0 is None else x0
        bnorm = norm(b)
        target = stop_target(bnorm, tol, atol)
        r = b - matvec(x)
        z = precond(r)
        p = z
        rz = dot(r, z)
        rnorm = norm(r)
        hist = history_buffer(maxiter, rnorm, b.dtype)

        def cond(state):
            _, _, _, _, rnorm, _, it = state
            return (it < maxiter) & (rnorm > target)

        def body(state):
            x, r, p, rz, _, hist, it = state
            Ap = matvec(p)
            alpha = safe_div(rz, dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = dot(r, z)
            beta = safe_div(rz_new, rz)
            p = z + beta * p
            rnorm = norm(r)
            hist = hist.at[it + 1].set(rnorm)
            return x, r, p, rz_new, rnorm, hist, it + 1

        x, r, p, rz, rnorm, hist, it = lax.while_loop(
            cond, body, (x, r, p, rz, rnorm, hist, jnp.int32(0)))
        relres = safe_div(rnorm, bnorm)
        return SolveResult(x=x, iters=it, relres=relres,
                           converged=rnorm <= target, history=hist)

    def solve(b, x0=None):
        return _solve(astate, mstate, b, x0)

    solve._fn = _solve        # (astate, mstate, b, x0) -> SolveResult
    solve._state = (astate, mstate)
    return solve


def pcg(A, b, x0=None, M=None, *, tol: float = 1e-5, atol: float = 0.0,
        maxiter: int = 1000) -> SolveResult:
    """One-shot convenience wrapper around :func:`pcg_setup`."""
    return pcg_setup(A, M, tol=tol, atol=atol, maxiter=maxiter)(b, x0)
