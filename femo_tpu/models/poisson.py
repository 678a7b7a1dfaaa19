"""Poisson source-control model (workload W1,
/root/reference/examples/poisson_opt/run_poisson_opt.py).

Provides both the eager graph-layer problem builder and a fully-jitted
device-resident opt-step (forward Newton-Krylov + IFT adjoint) used by the
benchmark and the multi-chip dry run.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fea import (
    FEA, FormDef, Function, FunctionSpace, bc_arrays, compile_form,
    create_unit_square_mesh, dx, ds, dot, grad, DirichletBC,
)
from ..graph.implicit import implicit_solve_jit

PI = np.pi
ALPHA = 1e-6


def interior_residual(w, g):
    """inner(grad u, grad v) - f v   (reference run_poisson_opt.py:31-37)."""
    return dot(grad(w.u), grad(w.v)) - w.f * w.v


def nitsche_boundary_residual(u_exact_fn, sym=True, beta=0.1):
    """Nitsche weak-BC boundary term (reference :40-63)."""
    sgn = 1.0 if sym else -1.0

    def bdry(w, g):
        ue = u_exact_fn(g.x)
        return (
            sgn * (ue - w.u) * dot(grad(w.v), g.n)
            - dot(grad(w.u), g.n) * w.v
            + beta / g.h * (w.u - ue) * w.v
        )

    return bdry


def tracking_objective(w, g):
    return 0.5 * (w.u - w.u_ex) ** 2 + ALPHA / 2 * w.f ** 2


def build_fea(nel: int = 16, weak_bc: bool = False, sym: bool = True):
    """FEA problem with named registry (API parity path)."""
    mesh = create_unit_square_mesh(nel)
    V = FunctionSpace(mesh, ("CG", 1))
    W = FunctionSpace(mesh, ("DG", 0))
    u, f = Function(V, "u"), Function(W, "f")
    u_ex = Function(V, "u_ex").interpolate(
        lambda x: 1 / (2 * PI**2) * np.sin(PI * x[0]) * np.sin(PI * x[1]))
    f_ex = Function(W, "f_ex").interpolate(
        lambda x: 1 / (1 + ALPHA * 4 * PI**4)
        * np.sin(PI * x[0]) * np.sin(PI * x[1]))

    integrals = [dx(interior_residual)]
    fea = FEA(mesh)
    if weak_bc:
        mesh.mark_boundary_facets(1)
        ue_fn = lambda x: (jnp.sin(PI * x[0]) * jnp.sin(PI * x[1])
                           / (2 * PI**2))
        integrals.append(
            ds(nitsche_boundary_residual(ue_fn, sym=sym), tag=1))
    else:
        fea.add_strong_bc(0.0, [lambda x: (
            np.isclose(x[0], 0) | np.isclose(x[0], 1)
            | np.isclose(x[1], 0) | np.isclose(x[1], 1))], V)

    residual = FormDef(integrals, coeffs=[u, f], test=V)
    objective = FormDef([dx(tracking_objective)], coeffs=[u, f, u_ex])

    fea.add_input("f", f)
    fea.add_state("u", u, residual, ["f"])
    fea.add_output("l2_functional", "scalar", objective, ["f", "u"])
    return fea, dict(u=u, f=f, u_ex=u_ex, f_ex=f_ex, V=V, W=W, mesh=mesh)


def build_jit_opt_step(nel: int = 64, device_mesh=None, solver: str = "cg"):
    """Fully-jittable opt step: f -> (J, dJ/df), all device-resident.

    If device_mesh is given, assembly is sharded over it (SPMD).
    Returns (step_fn, f0).
    """
    mesh = create_unit_square_mesh(nel)
    V = FunctionSpace(mesh, ("CG", 1))
    W = FunctionSpace(mesh, ("DG", 0))
    u, f = Function(V, "u"), Function(W, "f")
    u_ex = Function(V, "u_ex").interpolate(
        lambda x: 1 / (2 * PI**2) * np.sin(PI * x[0]) * np.sin(PI * x[1]))

    residual = FormDef([dx(interior_residual)], coeffs=[u, f], test=V)
    objective = FormDef([dx(tracking_objective)], coeffs=[u, f, u_ex])
    rcf, jcf = compile_form(residual), compile_form(objective)

    bc = DirichletBC(V, 0.0, where=lambda x: (
        np.isclose(x[0], 0) | np.isclose(x[0], 1)
        | np.isclose(x[1], 0) | np.isclose(x[1], 1)))
    free, bvals = bc_arrays([bc], V.n_dofs)

    if device_mesh is not None:
        from ..parallel.sharding import sharded_vector_fn, sharded_scalar_fn

        rfn = sharded_vector_fn(rcf, device_mesh)
        jfn = sharded_scalar_fn(jcf, device_mesh)
    else:
        rfn = rcf.vector_jit()
        jfn = jcf.scalar_jit()

    f64 = config.jdtype == jnp.float64
    if solver == "dense":
        from ..graph.implicit import implicit_solve_dense_jit

        def jac_dense(uu, p):
            return rcf.matrix({"u": uu, "f": p["f"]}, "u").to_dense()

        solve = implicit_solve_dense_jit(
            lambda uu, p: rfn({"u": uu, "f": p["f"]}), jac_dense,
            free, bvals, newton_iters=1)
    else:
        solve = implicit_solve_jit(
            lambda uu, p: rfn({"u": uu, "f": p["f"]}), free, bvals,
            newton_opts={"maxiter": 3,
                         "rtol": 1e-10 if f64 else 1e-5,
                         "atol": 1e-12 if f64 else 1e-7,
                         "krylov_rtol": 1e-12 if f64 else 1e-6,
                         "krylov_maxiter": 3000})

    def objective_of_f(farr):
        uu = solve({"f": farr}, jnp.zeros(V.n_dofs, config.jdtype))
        return jfn({"u": uu, "f": farr, "u_ex": u_ex.array})

    step = jax.jit(jax.value_and_grad(objective_of_f))
    f0 = jnp.full(W.n_dofs, 0.5, config.jdtype)
    return step, f0
