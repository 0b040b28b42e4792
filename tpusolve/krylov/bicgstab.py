"""Preconditioned BiCGSTAB for non-symmetric systems (momentum equations).

TPU-native replacement for ``HYPRE_ParCSRBiCGSTAB*`` (consumed by the
reference at src/HypreSystem.cpp:423-438).  Right-preconditioned van der
Vorst BiCGSTAB; two matvecs + two preconditioner applications per iteration,
all reductions fused by XLA into psum collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpusolve.krylov.common import (
    SolveResult, as_matvec, as_precond, dot, norm, safe_div, stop_target)


def bicgstab_setup(A, M=None, *, tol: float = 1e-5, atol: float = 0.0,
                   maxiter: int = 1000):
    matvec = as_matvec(A)
    precond = as_precond(M)

    @jax.jit
    def solve(b, x0=None):
        x = jnp.zeros_like(b) if x0 is None else x0
        bnorm = norm(b)
        target = stop_target(bnorm, tol, atol)
        r = b - matvec(x)
        r0 = r  # shadow residual
        rho = dot(r0, r)
        p = r
        rnorm = norm(r)

        def cond(state):
            x, r, p, rho, rnorm, it = state
            return (it < maxiter) & (rnorm > target)

        def body(state):
            x, r, p, rho, _, it = state
            phat = precond(p)
            v = matvec(phat)
            alpha = safe_div(rho, dot(r0, v))
            s = r - alpha * v
            shat = precond(s)
            t = matvec(shat)
            omega = safe_div(dot(t, s), dot(t, t))
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            rho_new = dot(r0, r)
            beta = safe_div(rho_new, rho) * safe_div(alpha, omega)
            p = r + beta * (p - omega * v)
            return x, r, p, rho_new, norm(r), it + 1

        x, r, p, rho, rnorm, it = lax.while_loop(
            cond, body, (x, r, p, rho, rnorm, jnp.int32(0)))
        relres = safe_div(rnorm, bnorm)
        return SolveResult(x=x, iters=it, relres=relres,
                           converged=rnorm <= target)

    return solve


def bicgstab(A, b, x0=None, M=None, **kw) -> SolveResult:
    return bicgstab_setup(A, M, **kw)(b, x0)
