"""W1 parity: Poisson source-control optimization.

Mirrors /root/reference/examples/poisson_opt/run_poisson_opt.py — linear
PDE, CG1 state / DG0 control, strong Dirichlet BCs, L2-tracking + Tikhonov
objective, SLSQP, manufactured-solution validation (SURVEY.md §2.2 W1,
§4.1).  Gradient parity is checked FD-vs-adjoint.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.fea import (
    FEA, FunctionSpace, Function, FormDef, dx, ds, grad, dot, inner,
    create_unit_square_mesh, errorNorm, assemble_scalar,
)
from femo_tpu.graph.model import FEAModel
from femo_tpu.graph.simulator import Simulator
from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP

PI = np.pi
ALPHA = 1e-6


def build_problem(nel=8):
    mesh = create_unit_square_mesh(nel)
    V = FunctionSpace(mesh, ("CG", 1))
    W = FunctionSpace(mesh, ("DG", 0))

    u = Function(V, "u")
    f = Function(W, "f")

    u_ex = Function(V, "u_ex").interpolate(
        lambda x: 1 / (2 * PI**2) * np.sin(PI * x[0]) * np.sin(PI * x[1]))
    f_ex = Function(W, "f_ex").interpolate(
        lambda x: 1 / (1 + ALPHA * 4 * PI**4)
        * np.sin(PI * x[0]) * np.sin(PI * x[1]))

    def interior(w, g):
        return dot(grad(w.u), grad(w.v)) - w.f * w.v

    residual = FormDef([dx(interior)], coeffs=[u, f], test=V)

    def objective(w, g):
        return 0.5 * (w.u - w.u_ex) ** 2 + ALPHA / 2 * w.f**2

    output = FormDef([dx(objective)], coeffs=[u, f, u_ex])

    fea = FEA(mesh)
    fea.add_input("f", f)
    fea.add_state("u", u, residual, ["f"])
    fea.add_output("l2_functional", "scalar", output, ["f", "u"])

    on_bdry = lambda x: (
        np.isclose(x[0], 0) | np.isclose(x[0], 1)
        | np.isclose(x[1], 0) | np.isclose(x[1], 1))
    fea.add_strong_bc(0.0, [on_bdry], V)
    return fea, u, f, u_ex, f_ex


def test_forward_solve_manufactured():
    fea, u, f, u_ex, f_ex = build_problem(16)
    # -lap(u) = f with u = sin(pi x) sin(pi y) / (2 pi^2)  =>  f = sin sin
    f_src = Function(f.space).interpolate(
        lambda x: np.sin(PI * x[0]) * np.sin(PI * x[1]))
    fea.solve("u", {"f": f_src.array})
    err = errorNorm(u_ex, u)
    assert err < 5e-3, err


def test_adjoint_gradient_matches_fd():
    fea, u, f, u_ex, f_ex = build_problem(6)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=f.space.n_dofs, val=0.5)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()
    report = sim.check_totals("l2_functional", "f", step=1e-7,
                              compact_print=False)
    rel = report[("l2_functional", "f")]["rel_error"]
    assert rel < 1e-6, rel


def test_optimization_recovers_manufactured_control():
    fea, u, f, u_ex, f_ex = build_problem(12)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=f.space.n_dofs, val=0.086)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()

    prob = OptimizationProblem(sim, problem_name="poisson_opt")
    opt = SLSQP(prob, ftol=1e-13, maxiter=100)
    res = opt.solve()

    f.array = sim.values["f"]
    control_err = errorNorm(f_ex, f)
    state_err = errorNorm(u_ex, u)
    # reference tolerances: optimum approaches manufactured solution to
    # discretization accuracy
    assert control_err < 0.05, control_err
    assert state_err < 5e-3, state_err
