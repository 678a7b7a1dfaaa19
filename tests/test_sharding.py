"""SPMD partitioned assembly: 8-virtual-device parity with single-device
assembly, and a fully sharded+jitted solve-and-gradient step (SURVEY.md §4's
"multi-node without a cluster" analogue)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.fea import (
    FunctionSpace, Function, FormDef, dx, ds, grad, dot,
    compile_form, create_unit_square_mesh, DirichletBC, bc_arrays,
)
from femo_tpu.parallel.sharding import (
    device_mesh, sharded_vector_fn, sharded_scalar_fn,
)


def _poisson(nel=8):
    mesh = create_unit_square_mesh(nel)
    V = FunctionSpace(mesh, ("CG", 1))
    W = FunctionSpace(mesh, ("DG", 0))
    u = Function(V, "u")
    f = Function(W, "f")

    def interior(w, g):
        return dot(grad(w.u), grad(w.v)) - w.f * w.v

    res = FormDef([dx(interior)], coeffs=[u, f], test=V)
    return mesh, V, W, u, f, res


def test_sharded_residual_matches_single_device(devices8):
    mesh, V, W, u, f, res = _poisson(9)  # 162 cells, not divisible by 8
    cf = compile_form(res)
    rng = np.random.default_rng(0)
    vals = {
        "u": jnp.asarray(rng.normal(size=V.n_dofs)),
        "f": jnp.asarray(rng.normal(size=W.n_dofs)),
    }
    r_single = cf.vector_jit()(vals)
    dm = device_mesh(8)
    r_sharded = jax.jit(sharded_vector_fn(cf, dm))(vals)
    np.testing.assert_allclose(
        np.asarray(r_sharded), np.asarray(r_single), atol=1e-12)


def test_sharded_scalar_matches(devices8):
    mesh, V, W, u, f, res = _poisson(7)
    J = FormDef([dx(lambda w, g: w.u ** 2 + 0.5 * w.f ** 2)], coeffs=[u, f])
    cf = compile_form(J)
    rng = np.random.default_rng(1)
    vals = {
        "u": jnp.asarray(rng.normal(size=V.n_dofs)),
        "f": jnp.asarray(rng.normal(size=W.n_dofs)),
    }
    s1 = cf.scalar_jit()(vals)
    dm = device_mesh(8)
    s8 = jax.jit(sharded_scalar_fn(cf, dm))(vals)
    np.testing.assert_allclose(float(s8), float(s1), rtol=1e-13)


def test_sharded_jit_solve_and_grad(devices8):
    """Full device-resident training step: sharded assembly + Newton-CG
    solve + IFT adjoint, all inside one jit."""
    from femo_tpu.graph.implicit import implicit_solve_jit
    from femo_tpu.parallel.sharding import sharded_vector_fn

    mesh, V, W, u, f, res = _poisson(6)
    bc = DirichletBC(V, 0.0, where=lambda x: (
        np.isclose(x[0], 0) | np.isclose(x[0], 1)
        | np.isclose(x[1], 0) | np.isclose(x[1], 1)))
    free, bvals = bc_arrays([bc], V.n_dofs)

    cf = compile_form(res)
    dm = device_mesh(8)
    rfn = sharded_vector_fn(cf, dm)

    u_ex = Function(V, "u_ex").interpolate(
        lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
    Jform = FormDef([dx(lambda w, g: 0.5 * (w.u - w.u_ex) ** 2)],
                    coeffs=[u, u_ex])
    Jcf = compile_form(Jform)
    jfn = sharded_scalar_fn(Jcf, dm)

    solve = implicit_solve_jit(
        lambda uu, p: rfn({"u": uu, "f": p["f"]}), free, bvals,
        newton_opts={"krylov_rtol": 1e-12})

    @jax.jit
    def step(fval):
        uu = solve({"f": fval}, jnp.zeros(V.n_dofs))
        return jfn({"u": uu, "u_ex": u_ex.array})

    f0 = jnp.ones(W.n_dofs) * 2.0
    val, g = jax.value_and_grad(step)(f0)
    assert np.isfinite(float(val))
    # FD check on a few entries
    eps = 1e-6
    for i in [0, 3, 17]:
        fp = f0.at[i].add(eps)
        fm = f0.at[i].add(-eps)
        fd = (float(step(fp)) - float(step(fm))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5, atol=1e-10)


def test_sharded_matrix_dense_matches(devices8):
    """Sharded Jacobian assembly == single-device assembled dense matrix."""
    from femo_tpu.parallel.sharding import sharded_matrix_dense_fn

    mesh, V, W, u, f, res = _poisson(9)  # 162 cells, not divisible by 8
    cf = compile_form(res)
    rng = np.random.default_rng(2)
    vals = {
        "u": jnp.asarray(rng.normal(size=V.n_dofs)),
        "f": jnp.asarray(rng.normal(size=W.n_dofs)),
    }
    A1 = cf.matrix(vals, "u").to_dense()
    dm = device_mesh(8)
    A8 = jax.jit(sharded_matrix_dense_fn(cf, dm, "u"))(vals)
    np.testing.assert_allclose(np.asarray(A8), np.asarray(A1), atol=1e-12)


def test_sharded_motor_step_gradient_parity(devices8):
    """North-star motor opt iteration, cells-sharded over 8 devices:
    objective and gradients match the single-device step to 1e-8 relative
    (VERDICT r1 item 2; BASELINE.md gradient-parity bar)."""
    from femo_tpu.models.motor.model import build_motor_jit_step

    kw = dict(refine=0.5, em_load_steps=1, mm_newton_iters=2,
              em_newton_iters=2)
    step1, (dv0, iq0), _ = build_motor_jit_step(**kw)
    dm = device_mesh(8)
    step8, _, _ = build_motor_jit_step(device_mesh=dm, **kw)

    v1, (gdv1, giq1) = step1(dv0, iq0)
    v8, (gdv8, giq8) = step8(dv0, iq0)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(gdv8), np.asarray(gdv1), rtol=1e-8)
    np.testing.assert_allclose(float(giq8), float(giq1), rtol=1e-8)


def test_sharded_shell_step_gradient_parity(devices8):
    """W6 CG2CG1 shell compliance step, cells-sharded over 8 devices:
    objective and d(compliance)/d(thickness) match the single-device step
    to 1e-8 relative — all three flagship families (Poisson, motor, shell)
    now run under shard_map."""
    from femo_tpu.models.shell import build_shell_sharded_step

    kw = dict(n_shell=(3, 4))
    step1, t0, _ = build_shell_sharded_step(**kw)
    dm = device_mesh(8)
    step8, _, _ = build_shell_sharded_step(device_mesh=dm, **kw)

    v1, g1 = step1(t0)
    v8, g8 = step8(t0)
    # reduction-order differences across devices leave ~1e-10 in f64 at
    # this conditioning (E=7e10 stiffness)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), rtol=1e-8)
