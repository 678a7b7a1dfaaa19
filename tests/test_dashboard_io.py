"""Dashboard geometry/field frames (lsdo_dash parity, dash_pav.py:9-80) and
W9 external aero-load time series (run_aeroelasticity_vpm.py:15-25)."""

import os

import numpy as np
import pytest

from femo_tpu.graph.dashboard import Dashboard
from femo_tpu.mesh.mesh import Mesh
from femo_tpu.models.fsi import aero_forces_from_file


# -- aero_forces_from_file (W9) -----------------------------------------------

def _series(n_t=5, n_pts=4):
    times = np.linspace(0.0, 1.0, n_t)
    forces = np.stack([np.full((n_pts, 3), float(k)) for k in range(n_t)])
    return times, forces


def test_aero_forces_npz_interpolation(tmp_path):
    times, forces = _series()
    path = str(tmp_path / "loads.npz")
    # store shuffled in time: the loader must sort before interpolating
    perm = np.array([3, 0, 4, 1, 2])
    np.savez(path, time=times[perm], forces=forces[perm])
    fn = aero_forces_from_file(path)
    # exact at a sample, linear between samples, clamped outside the range
    assert np.allclose(np.asarray(fn(0.5)), 2.0)
    assert np.allclose(np.asarray(fn(0.625)), 2.5)
    assert np.allclose(np.asarray(fn(-1.0)), 0.0)
    assert np.allclose(np.asarray(fn(9.0)), 4.0)
    assert np.asarray(fn(0.0)).shape == (4, 3)


def test_aero_forces_h5_and_custom_keys(tmp_path):
    h5py = pytest.importorskip("h5py")
    times, forces = _series()
    path = str(tmp_path / "restart.h5")
    with h5py.File(path, "w") as f:
        f["t_hist"] = times
        f["panel_forces"] = forces
    fn = aero_forces_from_file(path, times_key="t_hist",
                               forces_key="panel_forces")
    assert np.allclose(np.asarray(fn(0.25)), 1.0)
    assert np.allclose(np.asarray(fn(0.375)), 1.5)


def test_aero_forces_rejects_unknown_format(tmp_path):
    p = tmp_path / "loads.csv"
    p.write_text("not a restart file")
    with pytest.raises(ValueError, match="format"):
        aero_forces_from_file(str(p))


# -- Dashboard field frames ----------------------------------------------------

class _StubModel:
    objective = {"name": "compliance"}


class _StubProb:
    """Minimal OptimizationProblem shape the Dashboard consumes."""

    model = _StubModel()

    def __init__(self):
        self.callbacks = []
        self.history = [
            {"iter": 0, "obj": 3.0, "dvs": {"t": np.array([1.0, 2.0])},
             "constraints": {"vol": 0.4}},
            {"iter": 1, "obj": 2.5, "dvs": {"t": np.array([1.1, 1.9])},
             "constraints": {"vol": 0.38}},
        ]


def _tri_mesh(planar=True):
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    if not planar:
        coords = np.concatenate(
            [coords, np.array([[0.0], [0.3], [0.1], [0.5]])], axis=1)
    cells = np.array([[0, 1, 2], [1, 3, 2]])
    return Mesh(coords, cells, "triangle")


def test_dashboard_history_and_field_frames(tmp_path):
    pytest.importorskip("matplotlib")
    mesh = _tri_mesh()
    prob = _StubProb()
    dash = Dashboard(prob, outdir=str(tmp_path), every=1, mesh=mesh,
                     field_fn=lambda rec: np.arange(mesh.n_nodes, dtype=float),
                     field_name="stress")
    assert dash.update in prob.callbacks
    dash.update(prob.history[-1])
    assert os.path.exists(tmp_path / "frame_0001.png")
    assert os.path.exists(tmp_path / "frame_0001_stress.png")
    summary = dash.finalize()
    assert os.path.exists(summary)


def test_dashboard_per_cell_and_3d_and_quads(tmp_path):
    pytest.importorskip("matplotlib")
    prob = _StubProb()
    # per-cell data on a 3D (non-planar) tri mesh -> trisurf branch
    mesh3 = _tri_mesh(planar=False)
    d3 = Dashboard(prob, outdir=str(tmp_path / "a"), mesh=mesh3,
                   field_fn=lambda rec: np.array([1.0, 2.0]))
    drawn = d3.render_field_frame(str(tmp_path / "a" / "f.png"),
                                  prob.history[-1])
    assert os.path.exists(tmp_path / "a" / "f.png")
    # trisurf per-face set_array: the drawn colors ARE the per-cell values
    assert np.array_equal(drawn, [1.0, 2.0])
    # quad mesh splits each cell into two triangles; the duplicated values
    # must mirror the cell concat order ([all first halves, all second
    # halves] -> [3, 4, 3, 4], NOT [3, 3, 4, 4])
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                       [2.0, 0.0], [2.0, 1.0]])
    quads = Mesh(coords, np.array([[0, 1, 2, 3], [1, 4, 5, 2]]), "quad")
    dq = Dashboard(prob, outdir=str(tmp_path / "b"), mesh=quads,
                   field_fn=lambda rec: np.array([3.0, 4.0]))
    drawn = dq.render_field_frame(str(tmp_path / "b" / "f.png"),
                                  prob.history[-1])
    assert os.path.exists(tmp_path / "b" / "f.png")
    assert np.array_equal(drawn, [3.0, 4.0, 3.0, 4.0])


def test_dashboard_field_length_mismatch(tmp_path):
    pytest.importorskip("matplotlib")
    mesh = _tri_mesh()
    dash = Dashboard(_StubProb(), outdir=str(tmp_path), mesh=mesh,
                     field_fn=lambda rec: np.zeros(7))
    with pytest.raises(ValueError, match="per-node"):
        dash.render_field_frame(str(tmp_path / "f.png"),
                                {"iter": 0})
