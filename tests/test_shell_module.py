"""m3l-layer parity: ShellModule named operations (shell_module.py:14-466)."""

import numpy as np
import pytest
import jax.numpy as jnp

from femo_tpu.mesh.generators import create_rectangle_mesh
from femo_tpu.mesh.mesh import Mesh
from femo_tpu.models.shell import RMShellModel
from femo_tpu.models.shell_module import ShellModule
from femo_tpu.fea.bc import DirichletBC
from femo_tpu.graph.simulator import Simulator


def test_shell_module_pipeline():
    m2 = create_rectangle_mesh(6, 2, 0, 0, 5.0, 1.0, cell_type="triangle")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=1e7, nu=0.3)
    shell.thickness.set(0.05)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    # aero points: a coarse grid over the planform
    xs = np.linspace(0.3, 4.8, 5)
    ys = np.linspace(0.2, 0.8, 2)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size)], axis=1)

    mod = ShellModule(shell, bcs, pts)
    sim = Simulator(mod)
    F = np.zeros((len(pts), 3))
    F[:, 2] = -1.0  # point loads downward
    sim["nodal_forces"] = F
    out = sim.run()

    assert float(out["mass"]) == pytest.approx(0.05 * 5.0 * 1.0, rel=1e-12)
    assert float(out["compliance"]) > 0
    # Clapeyron
    np.testing.assert_allclose(float(out["compliance"]),
                               2 * float(out["elastic_energy"]), rtol=1e-8)
    # displacements at aero points: downward, growing with x
    d = np.asarray(out["nodal_displacements"])
    assert (d[:, 2] < 0).all()
    assert float(out["pnorm_stress"]) > 0
    vm = np.asarray(out["von_mises"])
    assert vm.shape == (mesh.n_nodes,) and np.isfinite(vm).all()
    # stress concentrates at the clamped root
    root = np.isclose(mesh.coords[:, 0], 0.0)
    assert vm[root].max() > 2 * vm[~root].mean()


def test_shell_module_objective_gradients_fd():
    """Adjoint totals THROUGH the module ops the W6 run scripts optimize
    (pnorm_stress is the stress constraint surface, compliance/mass the
    objective pair — run_pav_shell.py:305-340): FD-vs-adjoint on
    d(pnorm_stress)/d(thickness), d(compliance)/d(thickness), and
    d(mass)/d(thickness) (VERDICT r3 weak 4)."""
    m2 = create_rectangle_mesh(4, 2, 0, 0, 3.0, 1.0, cell_type="triangle")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=1e7, nu=0.3)
    shell.thickness.set(0.05)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    pts = np.array([[1.5, 0.5, 0.0], [2.5, 0.4, 0.0]])
    mod = ShellModule(shell, bcs, pts)
    sim = Simulator(mod)
    F = np.zeros((len(pts), 3))
    F[:, 2] = -2.0
    sim["nodal_forces"] = F
    sim.run()
    for of in ("pnorm_stress", "compliance", "mass"):
        rep = sim.check_totals(of=of, wrt=["thickness"], step=1e-7)
        rel = rep[(of, "thickness")]["rel_error"]
        assert rel < 2e-5, (of, rel)
