"""Pallas TPU kernels (interpret mode on CPU): ELL SpMV and fused
element-form SpMV vs the XLA reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.fea import (
    FunctionSpace, Function, FormDef, dx, grad, dot, assemble_matrix,
    create_unit_square_mesh,
)
from femo_tpu.ops.pallas_spmv import (
    PallasELLOperator, element_spmv_pallas, ell_spmv_reference,
    ell_from_element_matrix, ell_spmv_pallas,
)


@pytest.fixture(scope="module")
def stiffness():
    mesh = create_unit_square_mesh(8)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    form = FormDef([dx(lambda w, g: dot(grad(w.u), grad(w.v)))],
                   coeffs=[u], test=V)
    A = assemble_matrix(form, "u")
    return A, V


def test_ell_pack_and_reference_matvec(stiffness):
    A, V = stiffness
    vals, cols = ell_from_element_matrix(A)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=V.n_dofs))
    y_ref = np.asarray(A.matvec(x))
    y_ell = np.asarray(ell_spmv_reference(vals, cols, x))
    np.testing.assert_allclose(y_ell, y_ref, atol=1e-12)


def test_pallas_ell_spmv_matches(stiffness):
    A, V = stiffness
    op = PallasELLOperator(A, interpret=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=V.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12)


def test_pallas_element_spmv_matches(stiffness):
    A, V = stiffness
    b = A.blocks[0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=V.n_dofs))
    y = element_spmv_pallas(b.A, b.cols, x, V.n_dofs, b.rows,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.matvec(x)), atol=1e-12)


def test_pallas_cg_solve(stiffness):
    """CG with the Pallas matvec solves the same system (interpret mode)."""
    from femo_tpu.solvers.krylov import cg

    A, V = stiffness
    op = PallasELLOperator(A, interpret=True)
    rng = np.random.default_rng(3)
    # make SPD by adding mass-like diagonal shift (remove null space)
    shift = 1.0

    def mv(x):
        return op.matvec(x) + shift * x

    b = jnp.asarray(rng.normal(size=V.n_dofs))
    res = cg(mv, b, rtol=1e-10)
    assert bool(res.converged)
    r = np.asarray(b - mv(res.x))
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b))
