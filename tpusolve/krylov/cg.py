"""Preconditioned conjugate gradients.

TPU-native replacement for ``HYPRE_ParCSRPCG*`` (consumed by the reference at
src/HypreSystem.cpp:440-455).  Jitted ``lax.while_loop``; the two dot products
per iteration become ``psum`` collectives over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpusolve.krylov.common import (
    SolveResult, as_matvec, as_precond, dot, norm, safe_div, stop_target)


def pcg_setup(A, M=None, *, tol: float = 1e-5, atol: float = 0.0,
              maxiter: int = 1000):
    """Build a jitted PCG solver closure for operator ``A`` and
    preconditioner ``M`` (z = M(r))."""
    matvec = as_matvec(A)
    precond = as_precond(M)

    @jax.jit
    def solve(b, x0=None):
        x = jnp.zeros_like(b) if x0 is None else x0
        bnorm = norm(b)
        target = stop_target(bnorm, tol, atol)
        r = b - matvec(x)
        z = precond(r)
        p = z
        rz = dot(r, z)
        rnorm = norm(r)

        def cond(state):
            _, _, _, _, rnorm, it = state
            return (it < maxiter) & (rnorm > target)

        def body(state):
            x, r, p, rz, _, it = state
            Ap = matvec(p)
            alpha = safe_div(rz, dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = dot(r, z)
            beta = safe_div(rz_new, rz)
            p = z + beta * p
            return x, r, p, rz_new, norm(r), it + 1

        x, r, p, rz, rnorm, it = lax.while_loop(
            cond, body, (x, r, p, rz, rnorm, jnp.int32(0)))
        relres = safe_div(rnorm, bnorm)
        return SolveResult(x=x, iters=it, relres=relres,
                           converged=rnorm <= target)

    return solve


def pcg(A, b, x0=None, M=None, *, tol: float = 1e-5, atol: float = 0.0,
        maxiter: int = 1000) -> SolveResult:
    """One-shot convenience wrapper around :func:`pcg_setup`."""
    return pcg_setup(A, M, tol=tol, atol=atol, maxiter=maxiter)(b, x0)
