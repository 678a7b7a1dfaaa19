"""Dof-sharded halo-exchange operators: ghostUpdate fwd/rev parity over
all_to_all, sharded CG with psum dots (SURVEY.md N7 full analogue)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.fea import (
    FunctionSpace, Function, FormDef, dx, grad, dot, assemble_matrix,
    create_unit_square_mesh, DirichletBC, bc_arrays,
)
from femo_tpu.parallel.halo import HaloShardedOperator
from femo_tpu.parallel.sharding import device_mesh


@pytest.fixture(scope="module")
def system():
    mesh = create_unit_square_mesh(12)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    form = FormDef([dx(lambda w, g: dot(grad(w.u), grad(w.v)) + w.u * w.v)],
                   coeffs=[u], test=V)
    A = assemble_matrix(form, "u")
    bc = DirichletBC(V, 0.0, where=lambda x: np.isclose(x[0], 0))
    free, _ = bc_arrays([bc], V.n_dofs)
    return A, free, V


def test_halo_matvec_matches_single_device(system, devices8):
    A, free, V = system
    dm = device_mesh(8)
    op = HaloShardedOperator(A, V.dofmap, V.n_dofs, dm, free=free)
    rng = np.random.default_rng(0)
    x = rng.normal(size=V.n_dofs)
    xl = op.scatter_vector(x)
    yl = op.matvec(xl)
    y = np.asarray(op.gather_vector(yl))
    # single-device constrained reference
    xj = jnp.asarray(x)
    xf = jnp.where(free, xj, 0.0)
    y_ref = np.asarray(jnp.where(free, A.matvec(xf), xj))
    np.testing.assert_allclose(y, y_ref, atol=1e-11)


def test_halo_dot_product(system, devices8):
    A, free, V = system
    dm = device_mesh(8)
    op = HaloShardedOperator(A, V.dofmap, V.n_dofs, dm)
    rng = np.random.default_rng(1)
    x = rng.normal(size=V.n_dofs)
    y = rng.normal(size=V.n_dofs)
    d = float(op.dot(op.scatter_vector(x), op.scatter_vector(y)))
    np.testing.assert_allclose(d, float(np.dot(x, y)), rtol=1e-12)


def test_halo_sharded_cg_solves(system, devices8):
    """Distributed CG: solution matches the single-device dense solve."""
    A, free, V = system
    dm = device_mesh(8)
    op = HaloShardedOperator(A, V.dofmap, V.n_dofs, dm, free=free)
    rng = np.random.default_rng(2)
    b = rng.normal(size=V.n_dofs)
    bl = op.scatter_vector(b)
    xl, iters, rn = op.cg(bl, rtol=1e-12)
    x = np.asarray(op.gather_vector(xl))
    # reference
    Ad = np.asarray(A.to_dense())
    fr = np.asarray(free)
    Ac = Ad * fr[:, None] * fr[None, :] + np.diag((~fr).astype(float))
    x_ref = np.linalg.solve(Ac, b)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)
    assert int(iters) < V.n_dofs
