"""Newton solvers with damping, line search, and continuation hooks.

Replacement for PETSc SNES newtonls / dolfinx NewtonSolver (SURVEY.md N6;
reference SNESSolver at /root/reference/femo/fea/utils_dolfinx.py:376-416,
NewtonSolver at :419-449).  Tolerance defaults mirror the reference's SNES
settings (atol/rtol 1e-13, max_it 100).

Two flavors:
* :func:`newton_solve` — host-driven loop calling jitted residual/Jacobian/
  factorization; supports prints, damping, backtracking line search, adaptive
  continuation.  This is the robust production path (assembled Jacobian is
  reused for the adjoint transpose solve at the converged state).
* :func:`newton_solve_jit` — fully on-device `lax.while_loop` Newton-Krylov
  (matrix-free jvp), for the jitted benchmark/training-step path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import config
from ..fea.bc import apply_bc, constrain_residual
from .linear import LinearSolver
from .krylov import cg, bicgstab


@dataclass
class NewtonInfo:
    iters: int
    resnorm: float
    resnorm0: float
    converged: bool


def newton_solve(
    res_fn: Callable,
    jac_fn: Callable,
    u0: jnp.ndarray,
    free: jnp.ndarray,
    bc_values: jnp.ndarray,
    linear_solver: LinearSolver | None = None,
    rtol: float | None = None,
    atol: float | None = None,
    maxiter: int | None = None,
    damping: float = 1.0,
    line_search: str | None = None,  # None | "bt" (backtracking)
    report: bool | None = None,
):
    """Damped Newton with strong-BC masking.

    res_fn(u) -> R (n,); jac_fn(u) -> ElementMatrix.
    Returns (u, last Factorization, NewtonInfo). The factorization at the
    converged state is reused by the adjoint (fea_dolfinx.py:192-222 keeps
    the MUMPS ksp for the same reason).
    """
    rtol = config.newton_rtol if rtol is None else rtol
    atol = config.newton_atol if atol is None else atol
    maxiter = config.newton_maxiter if maxiter is None else maxiter
    report = config.report if report is None else report
    linear_solver = linear_solver or LinearSolver()

    u = apply_bc(u0, free, bc_values)
    Rc = constrain_residual(res_fn(u), u, free, bc_values)
    rn0 = float(jnp.linalg.norm(Rc))
    rn = rn0
    fac = None
    it = 0
    if report:
        print(f"  Newton 0: ||R|| = {rn0:.6e}")
    while it < maxiter and rn > max(atol, rtol * max(rn0, 1e-300)):
        fac = linear_solver.factor(jac_fn(u), free)
        du = fac.solve(-Rc)
        alpha = damping
        if line_search == "bt":
            for _ in range(8):
                u_try = apply_bc(u + alpha * du, free, bc_values)
                R_try = constrain_residual(
                    res_fn(u_try), u_try, free, bc_values)
                rn_try = float(jnp.linalg.norm(R_try))
                if rn_try < (1 - 1e-4 * alpha) * rn or rn_try < atol:
                    break
                alpha *= 0.5
            u, Rc, rn = u_try, R_try, rn_try
        else:
            u = apply_bc(u + alpha * du, free, bc_values)
            Rc = constrain_residual(res_fn(u), u, free, bc_values)
            rn = float(jnp.linalg.norm(Rc))
        it += 1
        if report:
            print(f"  Newton {it}: ||R|| = {rn:.6e} (alpha={alpha})")
    converged = rn <= max(atol, rtol * max(rn0, 1e-300))
    if fac is None:
        # already converged at entry; factor once for the adjoint
        fac = linear_solver.factor(jac_fn(u), free)
    return u, fac, NewtonInfo(it, rn, rn0, bool(converged))


def newton_solve_jit(
    res_fn: Callable,
    u0: jnp.ndarray,
    free: jnp.ndarray,
    bc_values: jnp.ndarray,
    rtol: float = 1e-10,
    atol: float = 1e-12,
    maxiter: int = 30,
    damping: float = 1.0,
    krylov: str = "cg",
    krylov_rtol: float = 1e-8,
    krylov_maxiter: int = 2000,
    diag_fn: Callable | None = None,
):
    """Fully jittable matrix-free Newton-Krylov (lax.while_loop).

    The Jacobian action is `jax.jvp` of the constrained residual — no matrix
    is ever formed; ideal for the pure-device benchmark path.
    diag_fn(u) optionally returns the Jacobian diagonal for Jacobi
    preconditioning.
    """
    solver = cg if krylov == "cg" else bicgstab

    def Rc(u):
        return constrain_residual(res_fn(u), u, free, bc_values)

    u0 = apply_bc(u0, free, bc_values)
    rn0 = jnp.linalg.norm(Rc(u0))

    def cond(state):
        u, rn, k = state
        return (rn > jnp.maximum(atol, rtol * rn0)) & (k < maxiter)

    def body(state):
        u, rn, k = state
        R = Rc(u)

        def jvp_mv(w):
            wf = jnp.where(free, w, 0.0)
            _, Jw = jax.jvp(Rc, (u,), (wf,))
            return jnp.where(free, Jw, w)

        M = None
        if diag_fn is not None:
            d = jnp.where(free, diag_fn(u), 1.0)
            d = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
            M = lambda x: x / d
        res = solver(jvp_mv, -R, M=M, rtol=krylov_rtol,
                     maxiter=krylov_maxiter)
        u = apply_bc(u + damping * res.x, free, bc_values)
        return (u, jnp.linalg.norm(Rc(u)), k + 1)

    u, rn, k = jax.lax.while_loop(cond, body, (u0, rn0, jnp.asarray(0)))
    return u, rn, k
