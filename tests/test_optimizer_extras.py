"""Optimizer-layer extras: external-driver (SNOPT) binding hook and the
per-iteration dashboard (VERDICT r1 items 8/9; reference
run_motor_opt.py:373-388 SNOPT driver, dash_pav.py:9-80 lsdo_dash)."""

import os

import numpy as np
import pytest

from femo_tpu.graph.model import FEAModel
from femo_tpu.graph.optimizer import (
    ExternalDriver, OptimizationProblem, SLSQP, SNOPT,
)
from femo_tpu.graph.simulator import Simulator
from femo_tpu.models.poisson import build_fea


@pytest.fixture()
def poisson_prob():
    fea, d = build_fea(8)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.086)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()
    return OptimizationProblem(sim, problem_name="poisson_ext"), d


def test_external_driver_mock(poisson_prob):
    """A mock external optimizer with the modOpt-style callback signature
    drives the problem through ExternalDriver."""
    prob, d = poisson_prob

    class MockDriver:
        """Fixed-step steepest descent through the neutral callbacks."""

        def __init__(self, cb, steps=5, lr=0.5):
            self.cb = cb
            self.steps = steps
            self.lr = lr

        def solve(self):
            x = np.asarray(self.cb["x0"], float)
            f0 = self.cb["objective"](x)
            for _ in range(self.steps):
                g = self.cb["objective_gradient"](x)
                x = x - self.lr * g
            self.result = {"f0": f0, "f": self.cb["objective"](x)}
            return x

    drv = ExternalDriver(prob, driver_factory=MockDriver, steps=5, lr=0.5)
    res = drv.solve()
    assert res["f"] < res["f0"], res
    # history callback fields populated (dashboard contract)
    rec = prob.history[-1]
    assert "dvs" in rec and "obj" in rec and "iter" in rec


def test_snopt_falls_back_to_slsqp(poisson_prob):
    """Without a SNOPT binding, the SNOPT driver warns and solves via
    SLSQP with translated tolerances (optional-dependency parity)."""
    prob, d = poisson_prob
    opt = SNOPT(prob, Major_iterations=40, Major_optimality=1e-9)
    with pytest.warns(UserWarning, match="SNOPT binding not available"):
        res = opt.solve()
    # objective reduced by >10x regardless of whether the tight ftol was
    # reached inside the iteration budget
    assert res.fun < prob.history[0]["obj"] * 1e5 * 0.1
    opt.print_results()


def test_snopt_drives_stub_modopt_binding(monkeypatch):
    """With a (stub) modopt.SNOPT importable, the SNOPT driver takes the
    real binding branch (optimizer.py solve() modopt path) and translates
    the problem into the neutral callbacks: x0/bounds, objective +
    gradient closures, constraint fun/jac rows, and the Major_* options
    passed through verbatim (reference run_motor_opt.py:373-380)."""
    import sys
    import types

    fea, d = build_fea(8)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.086)
    model.add_design_variable("f", lower=-2.0, upper=2.0)
    model.add_objective("l2_functional", scaler=1e5)
    # constraint on the same scalar output: exercises the constraint
    # fun/jac translation in ExternalDriver.callbacks()
    model.add_constraint("l2_functional", upper=1.0, scaler=1e5)
    sim = Simulator(model)
    sim.run()
    prob = OptimizationProblem(sim, problem_name="snopt_stub")

    seen = {}

    class _StubSNOPT:
        """Records the callback dict + options; runs 3 gradient steps."""

        def __init__(self, cb, **opts):
            seen["cb"] = cb
            seen["opts"] = opts

        def solve(self):
            cb = seen["cb"]
            x = np.asarray(cb["x0"], float)
            seen["f0"] = cb["objective"](x)
            for _ in range(3):
                x = np.clip(x - 0.5 * cb["objective_gradient"](x),
                            cb["lower"], cb["upper"])
            seen["f"] = cb["objective"](x)
            c = cb["constraints"][0]
            seen["c_val"] = np.asarray(c["fun"](x), float)
            seen["c_jac"] = np.asarray(c["jac"](x), float)
            self.result = x
            return x

    stub = types.ModuleType("modopt")
    stub.SNOPT = _StubSNOPT
    monkeypatch.setitem(sys.modules, "modopt", stub)

    opt = SNOPT(prob, Major_iterations=7, Major_optimality=1e-7,
                Major_feasibility=1e-5)
    x_opt = np.asarray(opt.solve(), float)
    # options forwarded verbatim to the binding
    assert seen["opts"] == dict(Major_iterations=7, Major_optimality=1e-7,
                                Major_feasibility=1e-5, append2file=False)
    # callback surface is complete and consistent
    cb = seen["cb"]
    assert cb["x0"].shape == (prob.nx,)
    assert np.all(cb["lower"] == -2.0) and np.all(cb["upper"] == 2.0)
    assert seen["f"] < seen["f0"]  # descent actually happened
    # constraint row: value matches the objective (same output, same
    # scaler) and the jacobian has the dense (1, nx) shape
    assert np.allclose(seen["c_val"], seen["f"], rtol=1e-12)
    assert seen["c_jac"].shape == (1, prob.nx)
    assert np.linalg.norm(seen["c_jac"]) > 0
    # driver wrote the optimum back into the simulator
    assert np.allclose(prob.x0, x_opt, atol=1e-12)
    opt.print_results()


def test_dashboard_writes_frames(tmp_path, poisson_prob):
    """Dashboard callback renders a PNG frame per iteration plus a final
    summary (lsdo_dash historic-plotter parity)."""
    from femo_tpu.graph.dashboard import Dashboard

    prob, d = poisson_prob
    mesh = d["mesh"]
    # DG0 control rendered per-cell (lsdo_dash field-frame parity)
    dash = Dashboard(
        prob, outdir=str(tmp_path / "dash"), every=2, mesh=mesh,
        field_fn=lambda rec: np.asarray(rec["dvs"]["f"]),
        field_name="control")
    opt = SLSQP(prob, ftol=1e-12, maxiter=6)
    opt.solve()
    summary = dash.finalize()
    frames = sorted(os.listdir(tmp_path / "dash"))
    assert "summary.png" in frames
    assert any(f.startswith("frame_") for f in frames)
    # 3D/field frames (lsdo_dash geometry+field parity)
    assert any(f.endswith("_control.png") for f in frames)
    assert os.path.getsize(summary) > 5000  # a real rendered PNG


def test_check_first_derivatives():
    """modOpt check_first_derivatives parity: FD-vs-adjoint of objective
    and constraint gradients in random directions."""
    from femo_tpu.models.poisson import build_fea
    from femo_tpu.graph.model import FEAModel
    from femo_tpu.graph.simulator import Simulator
    from femo_tpu.graph.optimizer import OptimizationProblem

    fea, d = build_fea(nel=6)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.1)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e3)
    sim = Simulator(model)
    sim.run()
    prob = OptimizationProblem(sim, "check_fd")
    rep = prob.check_first_derivatives(step=1e-7, compact_print=False)
    assert rep["objective"] < 1e-5, rep


def test_visualize_implementation_and_analytics(tmp_path, capsys):
    """Graph introspection parity: Simulator(analytics=True) prints the op
    DAG after run(); visualize_implementation renders/writes it
    (reference toggles at run_poisson_opt.py:187-188, run_topo:183)."""
    from femo_tpu.models.poisson import build_fea
    from femo_tpu.graph.model import FEAModel
    from femo_tpu.graph.simulator import Simulator

    fea, d = build_fea(nel=4)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.1)
    model.add_design_variable("f")
    model.add_objective("l2_functional")
    sim = Simulator(model, analytics=True)
    sim.run()
    out = capsys.readouterr().out
    assert "model graph:" in out and "l2_functional" in out

    p = str(tmp_path / "graph.txt")
    s = sim.visualize_implementation(path=p)
    assert "operations" in s
    assert open(p).read().strip() == s.strip()
