"""Krylov solver validation against nonsymmetric oracles (SURVEY.md N5:
the reference's ASM+GMRES path, utils_dolfinx.py:451-474).  GMRES here is
the native Arnoldi/Givens implementation (round-1 VERDICT weak #7: the
previous jax.scipy wrapper was fragile and untested)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femo_tpu.solvers.krylov import cg, bicgstab, gmres


def _convection_diffusion(n=120, peclet=0.4):
    """1D convection-diffusion with upwinding: genuinely nonsymmetric,
    well-conditioned."""
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 2.0 + peclet
        if i > 0:
            A[i, i - 1] = -1.0 - peclet
        if i < n - 1:
            A[i, i + 1] = -1.0
    return A


def test_gmres_nonsymmetric_oracle():
    A = _convection_diffusion()
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    x_ref = np.linalg.solve(A, b)

    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), restart=40,
                rtol=1e-12, atol=1e-13, maxiter=1200)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)


def test_gmres_restarted_and_preconditioned():
    """Convergence across restart cycles, and with a Jacobi right
    preconditioner."""
    rng = np.random.default_rng(1)
    n = 90
    R = rng.standard_normal((n, n))
    A = np.eye(n) * 4.0 + R / np.linalg.norm(R, 2)  # diag-dominant, nonsym
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)

    # restart smaller than the Krylov dimension needed -> multiple cycles
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), restart=15,
                rtol=1e-12, atol=1e-13, maxiter=600)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)

    dinv = jnp.asarray(1.0 / np.diag(A))
    resp = gmres(lambda v: Aj @ v, jnp.asarray(b), M=lambda v: dinv * v,
                 restart=15, rtol=1e-12, atol=1e-13, maxiter=600)
    assert bool(resp.converged)
    np.testing.assert_allclose(np.asarray(resp.x), x_ref, rtol=1e-8)


def test_gmres_transpose_solve_adjoint():
    """A^T solves (the adjoint path for nonsymmetric forms,
    fea_dolfinx.py:208-222 analogue) via the matvec closure."""
    A = _convection_diffusion(80)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(80)
    x_ref = np.linalg.solve(A.T, b)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj.T @ v, jnp.asarray(b), restart=40,
                rtol=1e-12, atol=1e-13, maxiter=1200)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)


def test_gmres_under_jit():
    A = _convection_diffusion(60)
    b = np.linspace(-1, 1, 60)
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)

    @jax.jit
    def solve(bv):
        return gmres(lambda v: Aj @ v, bv, restart=30,
                     rtol=1e-12, atol=1e-13, maxiter=900).x

    np.testing.assert_allclose(np.asarray(solve(jnp.asarray(b))), x_ref,
                               rtol=1e-8)


def test_gmres_exact_in_one_cycle_and_zero_rhs():
    """restart >= n converges in one cycle; b = 0 returns x = 0 without
    NaNs (breakdown guard)."""
    A = _convection_diffusion(24)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(24)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), restart=24,
                rtol=1e-13, atol=1e-14, maxiter=24)
    assert bool(res.converged) and int(res.iters) <= 24
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-9)

    z = gmres(lambda v: Aj @ v, jnp.zeros(24), restart=8, maxiter=64)
    assert np.isfinite(np.asarray(z.x)).all()
    np.testing.assert_allclose(np.asarray(z.x), 0.0, atol=1e-30)


def test_cg_bicgstab_sanity():
    """Companion sanity for the other KSP-zoo members on an SPD oracle."""
    n = 64
    A = _convection_diffusion(n, peclet=0.0)  # symmetric tridiag SPD
    rng = np.random.default_rng(4)
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)
    for solver in (cg, bicgstab):
        res = solver(lambda v: Aj @ v, jnp.asarray(b),
                     rtol=1e-12, atol=1e-13, maxiter=500)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7)
