"""Device-resident Krylov solvers (lax.while_loop, jit/vmap/shard-friendly).

TPU-native replacement for PETSc KSP (SURVEY.md N5; reference
solveKSP/solveKSP_mumps at /root/reference/femo/fea/utils_dolfinx.py:451-512).
Dot products are plain jnp reductions on one device; under shard_map the same
code runs SPMD with `psum`-reduced dots (see femo_tpu/parallel/).

All solvers are matrix-free: `matvec` is any callable, typically the
element-matrix SpMV or a `jax.jvp` of the assembled residual.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import config


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def _identity(x):
    return x


def cg(matvec: Callable, b: jnp.ndarray, x0=None, M: Callable | None = None,
       rtol: float | None = None, atol: float | None = None,
       maxiter: int | None = None) -> KrylovResult:
    """Preconditioned conjugate gradients for SPD systems."""
    rtol = config.krylov_rtol if rtol is None else rtol
    atol = config.krylov_atol if atol is None else atol
    maxiter = min(config.krylov_maxiter if maxiter is None else maxiter,
                  b.shape[0] * 4)
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    r0 = b - matvec(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    bnorm = jnp.linalg.norm(b)
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.vdot(r, r) > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0)))
    rn = jnp.linalg.norm(r)
    return KrylovResult(x, k, rn, rn <= jnp.sqrt(tol2))


def bicgstab(matvec: Callable, b: jnp.ndarray, x0=None,
             M: Callable | None = None, rtol: float | None = None,
             atol: float | None = None,
             maxiter: int | None = None) -> KrylovResult:
    """Preconditioned BiCGStab for general (nonsymmetric) systems."""
    rtol = config.krylov_rtol if rtol is None else rtol
    atol = config.krylov_atol if atol is None else atol
    maxiter = min(config.krylov_maxiter if maxiter is None else maxiter,
                  b.shape[0] * 4)
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    r0 = b - matvec(x0)
    rhat = r0
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)
    eps = jnp.finfo(b.dtype).tiny

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, brk = state
        return (jnp.linalg.norm(r) > tol) & (k < maxiter) & (~brk)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, brk = state
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        denom = jnp.vdot(rhat, v)
        alpha = rho_new / jnp.where(denom == 0, eps, denom)
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt == 0, eps, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        brk = (jnp.abs(rho_new) < eps) | (jnp.abs(omega) < eps)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, brk)

    one = jnp.asarray(1.0, b.dtype)
    state = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
             jnp.asarray(0), jnp.asarray(False))
    x, r, p, v, rho, alpha, omega, k, brk = jax.lax.while_loop(
        cond, body, state)
    rn = jnp.linalg.norm(r)
    return KrylovResult(x, k, rn, rn <= tol)


def gmres(matvec: Callable, b: jnp.ndarray, x0=None,
          M: Callable | None = None, restart: int = 50,
          rtol: float | None = None, atol: float | None = None,
          maxiter: int | None = None) -> KrylovResult:
    """Restarted GMRES via jax.scipy (left-preconditioned)."""
    from jax.scipy.sparse.linalg import gmres as jgmres

    rtol = config.krylov_rtol if rtol is None else rtol
    atol = config.krylov_atol if atol is None else atol
    maxiter = (config.krylov_maxiter if maxiter is None else maxiter)
    x, _ = jgmres(matvec, b, x0=x0, tol=rtol, atol=atol,
                  restart=min(restart, b.shape[0]),
                  maxiter=max(1, maxiter // restart), M=M or _identity,
                  solve_method="batched")
    r = b - matvec(x)
    rn = jnp.linalg.norm(r)
    tol = jnp.maximum(rtol * jnp.linalg.norm(b), atol)
    return KrylovResult(x, jnp.asarray(-1), rn, rn <= tol)


KRYLOV = {"cg": cg, "bicgstab": bicgstab, "gmres": gmres}
