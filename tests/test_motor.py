"""W5 parity: EM motor shape/current optimization (the north-star workload).

Validates the chained two-FEA-problem pipeline of
/root/reference/examples/em_motor_opt/run_motor_opt.py: mesh-motion
hyperelasticity with interior-facet Nitsche BCs, nonlinear magnetostatics
with the piecewise B-H law on the deformed configuration, incremental
continuation solvers, loss postprocessing, and the end-to-end IFT adjoint
through both states (1e-8 gradient parity per BASELINE.md).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from femo_tpu.graph.simulator import Simulator, pure_mode
from femo_tpu.models.motor import build_motor_model, create_motor_mesh
from femo_tpu.models.motor.mesh import MotorTags
from femo_tpu.models.motor.permeability import PiecewiseBHCurve
from femo_tpu.models.motor.pde import source_tables

T = MotorTags


def test_motor_mesh_subdomains():
    mesh = create_motor_mesh(0.5)
    tags = set(mesh.cell_tags.tolist())
    assert {T.ROTOR_STEEL, T.STATOR_STEEL, T.SHAFT, T.AIR} <= tags
    assert all(T.MAGNET_FIRST + i in tags for i in range(12))
    assert all(T.WINDING_FIRST + i in tags for i in range(36))
    assert (mesh.facet_tags == T.MAGNET_INTERFACE).sum() > 0
    assert (mesh.facet_tags == T.OUTER_BOUNDARY).sum() > 0


def test_bh_curve_c1_continuity():
    bh = PiecewiseBHCurve()
    for x in (bh.x1, bh.x2):
        lo = float(bh(jnp.asarray(x - 1e-8)))
        hi = float(bh(jnp.asarray(x + 1e-8)))
        np.testing.assert_allclose(lo, hi, rtol=1e-5)
        dlo = (float(bh(jnp.asarray(x - 1e-6))) - float(
            bh(jnp.asarray(x - 2e-6)))) / 1e-6
        dhi = (float(bh(jnp.asarray(x + 2e-6))) - float(
            bh(jnp.asarray(x + 1e-6)))) / 1e-6
        np.testing.assert_allclose(dlo, dhi, rtol=2e-2, atol=1.0)
    # saturates toward mu_r -> 1
    assert float(bh(jnp.asarray(3.0))) < float(bh(jnp.asarray(0.5)))
    assert float(bh(jnp.asarray(6.0))) > 1.0


def test_source_tables_three_phase():
    H, J = source_tables(jnp.asarray(100.0), jnp.asarray(0.3))
    H, J = np.asarray(H), np.asarray(J)
    # magnets: alternating polarity, uniform magnitude
    mags = H[T.MAGNET_FIRST : T.MAGNET_LAST + 1]
    norms = np.linalg.norm(mags, axis=1)
    np.testing.assert_allclose(norms, norms[0], rtol=1e-12)
    # windings: pole-alternating signs cancel over the full winding set
    w = J[T.WINDING_FIRST : T.WINDING_LAST + 1]
    np.testing.assert_allclose(w.sum(), 0.0, atol=1e-9 * 100)
    assert np.abs(w).max() > 0


@pytest.fixture(scope="module")
def motor_sim():
    model, d = build_motor_model(refine=0.5, em_load_steps=2)
    sim = Simulator(model)
    sim["shape_dv"] = np.array([5e-4, 3e-4])
    out = sim.run()
    return model, d, sim, out


def test_motor_forward(motor_sim):
    model, d, sim, out = motor_sim
    assert float(out["loss_sum"]) > 0
    # Arkkio torque: finite, physically-scaled
    assert 0.1 < abs(float(out["torque"])) < 1e3
    assert float(out["eddy_current_loss"]) > 0
    assert float(out["hysteresis_loss"]) > 0
    # areas close to nominal geometry (small shape perturbation)
    assert 5e-4 < float(out["magnet_area"]) < 2e-3
    assert 1e-3 < float(out["winding_area"]) < 3e-3
    # mesh motion actually moved the interface
    assert float(jnp.abs(d["uhat"].array).max()) > 1e-4


def test_motor_chained_adjoint_fd(motor_sim):
    """End-to-end adjoint through BOTH implicit states vs central FD."""
    model, d, sim, out = motor_sim
    tot = sim.compute_totals("loss_sum", ["iq", "shape_dv"])
    g_iq = float(tot[("loss_sum", "iq")])
    g_dv = np.asarray(tot[("loss_sum", "shape_dv")])

    def f(**over):
        vals = dict(sim.values)
        for k, v in over.items():
            vals[k] = jnp.asarray(v)
        with pure_mode():
            return float(model.evaluate(vals)["loss_sum"])

    def central(name, x0, h, i=None):
        if i is None:
            return (f(**{name: x0 + h}) - f(**{name: x0 - h})) / (2 * h)
        xp, xm = x0.copy(), x0.copy()
        xp[i] += h
        xm[i] -= h
        return (f(**{name: xp}) - f(**{name: xm})) / (2 * h)

    def richardson(name, x0, h, i=None):
        """(4 D(h/2) - D(h)) / 3 kills the O(h^2) truncation term; the
        plain central difference converges cleanly at O(h^2) here, so this
        reaches ~1e-10 relative — enough to enforce the 1e-8 bar."""
        return (4 * central(name, x0, h / 2, i)
                - central(name, x0, h, i)) / 3

    # BASELINE.md gradient-parity bar: 1e-8 relative in f64
    iq0 = float(sim.values["iq"])
    fd_iq = richardson("iq", iq0, 2.0)
    assert abs(g_iq - fd_iq) / abs(fd_iq) < 1e-8

    # FD sweep over ALL shape design variables
    dv0 = np.asarray(sim.values["shape_dv"])
    for i in range(len(dv0)):
        fdi = richardson("shape_dv", dv0, 4e-6, i)
        assert abs(g_dv[i] - fdi) / abs(fdi) < 1e-8, (
            f"dv[{i}]: ad={g_dv[i]:.12e} fd={fdi:.12e}")


def test_em_nitsche_weak_bc_matches_strong():
    """EM solve with Nitsche weak boundary enforcement (Nanson-transformed
    normals, pdeResEM nitsche=True parity) agrees with the strong-BC solve."""
    import jax.numpy as jnp

    from femo_tpu.fea import FunctionSpace, Function, compile_form
    from femo_tpu.fea.forms import GlobalCoefficient
    from femo_tpu.fea.bc import DirichletBC, bc_arrays
    from femo_tpu.models.motor import create_motor_mesh
    from femo_tpu.models.motor.mesh import RADII
    from femo_tpu.models.motor.pde import (
        NTAGS, em_residual_form, em_nitsche_boundary_form, source_tables,
    )
    from femo_tpu.models.motor.permeability import PiecewiseBHCurve
    from femo_tpu.solvers.linear import LinearSolver
    from femo_tpu.solvers.newton import newton_solve

    mesh = create_motor_mesh(0.5)
    Vmm = FunctionSpace(mesh, ("CG", 1), ncomp=2)
    Vem = FunctionSpace(mesh, ("CG", 1))
    uhat = Function(Vmm, "uhat")
    A_z = Function(Vem, "A_z")
    Ht = GlobalCoefficient("Htable", jnp.zeros((NTAGS, 2)))
    Jt = GlobalCoefficient("Jtable", jnp.zeros(NTAGS))
    bh = PiecewiseBHCurve()
    Hv, Jv = source_tables(jnp.asarray(2e4), jnp.asarray(0.0))
    vals = {"uhat": uhat.array, "Htable": Hv, "Jtable": Jv}

    base = em_residual_form(A_z, uhat, Ht, Jt, bh)
    on_rim = lambda x: (
        np.isclose(np.hypot(x[0], x[1]), RADII["r0"], atol=1e-9)
        | np.isclose(np.hypot(x[0], x[1]), RADII["r6"], atol=1e-9))

    def solve(form, bcs):
        cf = compile_form(form)
        free, bv = bc_arrays(bcs, Vem.n_dofs)
        u, fac, info = newton_solve(
            lambda u: cf.vector({**vals, "A_z": u}),
            lambda u: __import__("femo_tpu.fea.assemble",
                                 fromlist=["ElementMatrix"]).ElementMatrix(
                [__import__("femo_tpu.fea.assemble",
                            fromlist=["MatBlock"]).MatBlock(*b)
                 for b in cf.matrix_blocks_jit("A_z")({**vals, "A_z": u})],
                Vem.n_dofs, Vem.n_dofs),
            jnp.zeros(Vem.n_dofs), free, bv,
            LinearSolver(method="scipy"), maxiter=12, line_search="bt")
        assert info.converged or info.resnorm < 1e-6
        return u

    u_strong = solve(base, [DirichletBC(Vem, 0.0, where=on_rim)])
    weak = base + em_nitsche_boundary_form(A_z, uhat, bh)
    u_weak = solve(weak, [])
    # interior agreement (away from the boundary rows)
    r = np.hypot(*Vem.scalar_dof_coords.T)
    interior = (r > RADII["r0"] * 1.5) & (r < RADII["r6"] * 0.9)
    scale = np.abs(np.asarray(u_strong)).max()
    diff = np.abs(np.asarray(u_weak - u_strong))[interior].max() / scale
    assert diff < 2e-3, diff


def test_motor_edge_delta_design_space():
    """Wide per-interface-node design space (BoundaryInputModel parity,
    preprocessor/boundary_input_model.py:34-71): the dv is one (dx, dy)
    per magnet-ring interface node (288 at refine=0.5; thousands at the
    reference's fine mesh).  Checks (a) the scatter chain reproduces the
    2-dof basis loss for the equivalent boundary displacement, (b) IFT
    adjoint FD parity on a random subset of deltas — one adjoint solve
    yields the full wide gradient."""
    from femo_tpu.models.motor.model import build_motor_jit_step

    step_b, (dvb, iq0), _ = build_motor_jit_step(
        refine=0.5, em_load_steps=3, mm_newton_iters=4, em_newton_iters=4)
    vb, _ = step_b(dvb, iq0)

    step_e, (dve, iq0e), _ = build_motor_jit_step(
        refine=0.5, em_load_steps=3, mm_newton_iters=4, em_newton_iters=4,
        design_space="edge_deltas")
    ve, (gd, gi) = step_e(dve, iq0e)
    assert dve.shape == (288,) and gd.shape == (288,)
    np.testing.assert_allclose(float(ve), float(vb), rtol=1e-12)

    rng = np.random.default_rng(0)
    h = 1e-7
    for i in rng.choice(dve.shape[0], 3, replace=False):
        vp, _ = step_e(dve.at[i].add(h), iq0e)
        vm, _ = step_e(dve.at[i].add(-h), iq0e)
        fd = (float(vp) - float(vm)) / (2 * h)
        np.testing.assert_allclose(float(gd[i]), fd, rtol=5e-7)


def test_motor_ffd_shape_parameter_layer():
    """dv -> Fourier shape params -> edge deltas -> uhat_bc chain
    (ffd_model.py:55-87 parity) through the graph model: the k=0 radial
    coefficient on both rings reproduces a pure radial expansion."""
    from femo_tpu.models.motor.model import (
        edge_delta_design_space, ffd_shape_parameter_layer)
    from femo_tpu.fea import FunctionSpace
    from femo_tpu.models.motor.mesh import create_motor_mesh, RADII

    mesh = create_motor_mesh(0.5)
    Vmm = FunctionSpace(mesh, ("CG", 1), ncomp=2)
    scatter, n_dv, iface_nodes, _ = edge_delta_design_space(mesh, Vmm)
    to_deltas, n_par = ffd_shape_parameter_layer(mesh, Vmm, n_harmonics=2)
    assert n_par == 2 * (2 * 2 + 1)
    params = np.zeros(n_par)
    params[0] = 1e-3  # ring r2 constant radial coefficient
    params[5] = 1e-3  # ring r3 constant radial coefficient
    bc = np.asarray(scatter(to_deltas(jnp.asarray(params))))
    coords = Vmm.scalar_dof_coords
    r = np.linalg.norm(coords, axis=1)
    on_iface = (np.isclose(r, RADII["r2"], atol=1e-9)
                | np.isclose(r, RADII["r3"], atol=1e-9))
    disp = bc.reshape(-1, 2)
    # interface nodes move radially by 1e-3, others not at all
    np.testing.assert_allclose(
        np.linalg.norm(disp[on_iface], axis=1), 1e-3, rtol=1e-12)
    assert np.all(disp[~on_iface] == 0.0)
