"""XDMF recorder + profiling utilities (aux subsystems, SURVEY.md §5, N9)."""

import os

import numpy as np
import pytest

from femo_tpu.fea import FunctionSpace, Function, create_unit_square_mesh
from femo_tpu.io.xdmf import XDMFWriter, Recorder
from femo_tpu.utils.profiling import Timer, StageTimers, profile


def test_xdmf_roundtrip(tmp_path):
    import h5py

    mesh = create_unit_square_mesh(4)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u").interpolate(lambda x: x[0] + 2 * x[1])
    fn = str(tmp_path / "out" / "state_u.xdmf")
    with XDMFWriter(fn, mesh) as xdmf:
        xdmf.write_function(u, t=0)
        u.array = u.array * 2
        xdmf.write_function(u, t=1)
    assert os.path.exists(fn)
    h5 = fn.replace(".xdmf", ".h5")
    with h5py.File(h5) as f:
        np.testing.assert_allclose(f["mesh/coords"][:, :2], mesh.coords)
        d0 = f["fields/u/0"][:]
        d1 = f["fields/u/1"][:]
        np.testing.assert_allclose(d1, 2 * d0)
    xml = open(fn).read()
    assert "Triangle" in xml and "Temporal" in xml


def test_recorder_per_variable(tmp_path):
    mesh = create_unit_square_mesh(3)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    rec = Recorder(str(tmp_path / "records"))
    for it in range(3):
        u.array = u.array + 1.0
        rec.write("u", u, it)
    rec.close()
    assert os.path.exists(str(tmp_path / "records" / "record_u.xdmf"))


def test_timers(capsys):
    with Timer("Solve nonlinear"):
        sum(range(1000))
    out = capsys.readouterr().out
    assert "Solve nonlinear finished in" in out

    st = StageTimers()
    with st.stage("assembly"):
        sum(range(100))
    with st.stage("assembly"):
        sum(range(100))
    assert st.counts["assembly"] == 2


def test_profile_decorator(tmp_path):
    fn = str(tmp_path / "prof")

    @profile(fn)
    def work():
        return sum(range(10000))

    work()
    assert any(f.startswith("prof.") for f in os.listdir(tmp_path))


def test_checkpoint_roundtrip(tmp_path):
    """Save/resume an optimization state (beyond-reference aux subsystem)."""
    import jax.numpy as jnp

    from femo_tpu.models.poisson import build_fea
    from femo_tpu.graph.model import FEAModel
    from femo_tpu.graph.simulator import Simulator
    from femo_tpu.graph.optimizer import OptimizationProblem
    from femo_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

    fea, d = build_fea(nel=4)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.3)
    model.add_design_variable("f")
    model.add_objective("l2_functional")
    sim = Simulator(model)
    sim.run()
    prob = OptimizationProblem(sim)
    prob.history.append({"obj": 1.23, "time": 0.0})
    path = str(tmp_path / "ck" / "opt.npz")
    save_checkpoint(path, sim, prob, extra={"note": 7})

    # fresh simulator, restore
    fea2, d2 = build_fea(nel=4)
    model2 = FEAModel(fea=[fea2])
    model2.create_input("f", shape=d2["W"].n_dofs, val=0.0)
    model2.add_design_variable("f")
    model2.add_objective("l2_functional")
    sim2 = Simulator(model2)
    prob2 = OptimizationProblem(sim2)
    extras = load_checkpoint(path, sim2, prob2)
    np.testing.assert_allclose(np.asarray(sim2.values["f"]), 0.3)
    np.testing.assert_allclose(
        np.asarray(fea2.states_dict["u"]["function"].array),
        np.asarray(fea.states_dict["u"]["function"].array))
    assert prob2.history[0]["obj"] == pytest.approx(1.23)
    assert int(extras["note"]) == 7


def test_dump_gradient_fields(tmp_path):
    """Analytic vs FD vs error gradient FIELDS to XDMF (reference
    run_aeroelasticity_static_w_feedback.py:399-428 parity): the dump
    must contain all three fields, the analytic/fd datasets must agree,
    and the error field must be their difference."""
    import h5py

    from tests.test_poisson_opt import build_problem
    from femo_tpu.graph.model import FEAModel
    from femo_tpu.graph.simulator import Simulator

    fea, u, f, u_ex, f_ex = build_problem(5)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=f.space.n_dofs, val=0.5)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()
    path = str(tmp_path / "grad" / "dJ_df.xdmf")
    rep = sim.dump_gradient_fields("l2_functional", "f", f.space, path,
                                  step=1e-7)
    assert rep["rel_error"] < 1e-6
    with h5py.File(path.replace(".xdmf", ".h5")) as h5:
        an = h5["fields/dl2_functional_df_analytic/0"][:]
        fd = h5["fields/dl2_functional_df_fd/1"][:]
        er = h5["fields/dl2_functional_df_error/2"][:]
        np.testing.assert_allclose(an, rep["analytic"].ravel())
        np.testing.assert_allclose(an - fd, er, atol=1e-12)
        assert np.abs(er).max() < 1e-5 * np.abs(an).max() + 1e-12
    xml = open(path).read()
    assert "analytic" in xml and "_fd" in xml and "_error" in xml


def test_dump_gradient_fields_wrong_space_raises(tmp_path):
    from tests.test_poisson_opt import build_problem
    from femo_tpu.graph.model import FEAModel
    from femo_tpu.graph.simulator import Simulator

    fea, u, f, u_ex, f_ex = build_problem(4)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=f.space.n_dofs, val=0.5)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()
    with pytest.raises(ValueError, match="dofs"):
        sim.dump_gradient_fields("l2_functional", "f", u.space,
                                 str(tmp_path / "g.xdmf"))
