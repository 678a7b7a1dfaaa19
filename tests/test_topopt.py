"""W4 parity: SIMP topology optimization (2D elasticity + density filter)."""

import numpy as np
import pytest
import jax.numpy as jnp

from femo_tpu.models.topopt import (
    build_topopt_model, build_topopt_problem, stiffness_interpolation,
)
from femo_tpu.graph.filters import DensityFilter
from femo_tpu.graph.simulator import Simulator
from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP


def test_filter_partition_of_unity():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(100, 2))
    filt = DensityFilter(pts, radius=0.2)
    ones = jnp.ones(100)
    np.testing.assert_allclose(np.asarray(filt(ones)), 1.0, atol=1e-12)
    # smoothing reduces variance
    x = jnp.asarray(rng.uniform(size=100))
    assert float(jnp.var(filt(x))) < float(jnp.var(x))


def test_elasticity_forward_and_gradient():
    model, fea, d = build_topopt_model(num_el_x=12, num_el_y=6)
    sim = Simulator(model)
    out = sim.run()
    assert float(out["compliance"]) > 0
    np.testing.assert_allclose(float(out["avg_density"]), 0.4, rtol=1e-10)
    rep = sim.check_totals("compliance", "density_unfiltered", step=1e-7,
                           compact_print=False)
    assert rep[("compliance", "density_unfiltered")]["rel_error"] < 1e-5


def test_ramp_interpolation():
    r = stiffness_interpolation(jnp.asarray(1.0), "RAMP")
    np.testing.assert_allclose(float(r), 1.0)
    r0 = stiffness_interpolation(jnp.asarray(0.0), "RAMP")
    np.testing.assert_allclose(float(r0), 0.0)


def test_topopt_iterations_reduce_compliance():
    """A few SLSQP iterations must reduce compliance while respecting the
    volume constraint (full convergence is a long-run example, not a test)."""
    model, fea, d = build_topopt_model(num_el_x=16, num_el_y=8)
    fea.solve_mode = "jit_dense"
    sim = Simulator(model, jit=True)
    out0 = sim.run()
    c0 = float(out0["compliance"])

    prob = OptimizationProblem(sim, "topo")
    opt = SLSQP(prob, ftol=1e-9, maxiter=15)
    opt.solve()
    out = sim.outputs
    c1 = float(out["compliance"])
    assert c1 < 0.7 * c0, (c0, c1)
    assert float(out["avg_density"]) <= 0.4 + 1e-6
