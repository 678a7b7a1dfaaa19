"""W3 parity: Hermite-beam thickness optimization vs OpenMDAO reference.

Validation strategy follows SURVEY.md §4.2 (reference-data comparison):
forward solve vs Euler-Bernoulli closed form, adjoint FD parity, and the
thickness-distribution optimum against the 50-value OpenMDAO oracle.
"""

import numpy as np
import pytest

from femo_tpu.models.beam import build_beam_problem, OPENMDAO_THICK_REF
from femo_tpu.graph.model import FEAModel
from femo_tpu.graph.simulator import Simulator
from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP


def test_cantilever_tip_deflection_closed_form():
    """Uniform beam tip deflection: w(L) = P L^3 / (3 EI). Hermite cubics
    represent the exact cubic solution, so this is exact to roundoff."""
    fea, d = build_beam_problem(nel=10)
    fea.solve("displacements")
    u = d["u"]
    E, b, h, L, P = 1.0, 0.1, 0.1, 1.0, -1.0
    EI = E * b * h**3 / 12
    w_tip_exact = P * L**3 / (3 * EI)
    # value dofs are the even entries; tip = last node
    disp = np.asarray(u.array)[0::2]
    np.testing.assert_allclose(disp[-1], w_tip_exact, rtol=1e-9)


def test_beam_adjoint_fd():
    fea, d = build_beam_problem(nel=8)
    model = FEAModel(fea=[fea])
    model.create_input("thickness", shape=d["W"].n_dofs, val=0.1)
    model.add_design_variable("thickness")
    model.add_objective("compliance")
    sim = Simulator(model)
    sim.run()
    rep = sim.check_totals("compliance", "thickness", step=1e-8,
                           compact_print=False)
    assert rep[("compliance", "thickness")]["rel_error"] < 1e-5


def test_thickness_optimization_matches_openmdao():
    """Full jitted graph (linear problem -> dense-LU implicit op) + scaled
    SLSQP: converges in ~16 iterations to the OpenMDAO optimum."""
    nel = 50
    fea, d = build_beam_problem(nel=nel)
    fea.linear_problem = True
    fea.solve_mode = "jit_dense"
    model = FEAModel(fea=[fea])
    model.create_input("thickness", shape=nel, val=0.1)
    model.add_design_variable("thickness", lower=1e-2, upper=10.0,
                              scaler=10.0)
    model.add_objective("compliance", scaler=1e-4)
    model.add_constraint("volume", equals=0.1 * 0.1 * 1.0, scaler=1e2)
    sim = Simulator(model, jit=True)
    sim.run()

    prob = OptimizationProblem(sim, "beam_thickness_opt")
    opt = SLSQP(prob, ftol=1e-10, maxiter=200)
    opt.solve()

    t_opt = np.asarray(sim.values["thickness"])
    # reference overlays the OpenMDAO distribution (:252-272)
    err = np.abs(t_opt - OPENMDAO_THICK_REF)
    assert err.max() < 1e-4, (err.max(), t_opt[:5], OPENMDAO_THICK_REF[:5])
