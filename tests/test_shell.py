"""W6 parity: Reissner-Mindlin shell (CG2/CG1 composite state).

Validation per SURVEY.md §4: beam-theory closed form (cantilever plate),
Scordelis-Lo roof oracle (-0.3024, reference run_shape_opt_roof.py:224),
Clapeyron energy identity, and composite-state adjoint FD parity.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.mesh.generators import create_rectangle_mesh
from femo_tpu.mesh.mesh import Mesh
from femo_tpu.models.shell import RMShellModel
from femo_tpu.fea import assemble_scalar
from femo_tpu.fea.bc import DirichletBC


def flat_plate(nx=12, ny=2, L=10.0, b=1.0):
    m2 = create_rectangle_mesh(nx, ny, 0, 0, L, b, cell_type="triangle")
    coords3 = np.concatenate(
        [m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    return Mesh(coords3, m2.cells, "triangle")


@pytest.fixture(scope="module")
def cantilever():
    L, b, t, E, q = 10.0, 1.0, 0.1, 1e6, 1e-3
    mesh = flat_plate(12, 2, L, b)
    shell = RMShellModel(mesh, E=E, nu=0.0)
    shell.thickness.set(t)
    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = -q
    shell.force.array = jnp.asarray(farr)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state, op, x = shell.solve(bcs)
    return shell, state, op, dict(L=L, b=b, t=t, E=E, q=q)


def test_cantilever_plate_beam_theory(cantilever):
    shell, state, op, p = cantilever
    w = np.asarray(shell.u.array).reshape(-1, 3)[:, 2]
    tip = np.argmax(shell.Vu.scalar_dof_coords[:, 0])
    I = p["t"] ** 3 / 12
    w_exact = -p["q"] * p["L"] ** 4 / (8 * p["E"] * I)
    np.testing.assert_allclose(w[tip], w_exact, rtol=5e-3)


def test_mass_energy_compliance(cantilever):
    shell, state, op, p = cantilever
    mass = float(assemble_scalar(shell.mass_form))
    np.testing.assert_allclose(mass, p["t"] * p["L"] * p["b"], rtol=1e-12)
    # Clapeyron: compliance = 2 x elastic energy for linear elasticity
    # (tolerance covers the device block-Thomas solve's roundoff)
    c = float(assemble_scalar(shell.compliance_form))
    en = float(assemble_scalar(shell.energy_form))
    np.testing.assert_allclose(c, 2 * en, rtol=1e-8)
    # p-norm stress aggregate is positive and scales with p
    svm8 = float(assemble_scalar(shell.pnorm_stress_form(p=8.0, m=1.0)))
    assert svm8 > 0


def test_composite_adjoint_thickness_fd(cantilever):
    """d(compliance)/d(thickness) through the composite (u, theta) state."""
    from femo_tpu.fea.assemble import compile_form

    shell, state, op, p = cantilever
    ccf = compile_form(shell.compliance_form)

    def compliance_of_t(tarr):
        x = op({"thickness": tarr}, jax.lax.stop_gradient(state.current()))
        parts = state.split(x)
        return ccf.scalar({"u": parts["u"], "force": shell.force.array})

    t0 = shell.thickness.array
    val, g = jax.value_and_grad(compliance_of_t)(t0)
    h = 1e-6
    for i in [0, 5]:
        fp = float(compliance_of_t(t0.at[i].add(h)))
        fm = float(compliance_of_t(t0.at[i].add(-h)))
        fd = (fp - fm) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5)


def test_scordelis_lo_oracle():
    """Cylindrical roof benchmark: free-edge midspan vertical deflection
    vs the -0.3024 theory oracle (converges to -0.3027 at 32x32; the
    16x16 flat-facet value is ~-0.288, within 5%)."""
    R, L, t, E, q = 25.0, 50.0, 0.25, 4.32e8, 90.0
    phi_max = np.deg2rad(40.0)
    n = 16
    m2 = create_rectangle_mesh(n, n, -phi_max, 0.0, phi_max, L,
                               cell_type="triangle")
    phi, y = m2.coords[:, 0], m2.coords[:, 1]
    coords3 = np.stack([R * np.sin(phi), y, R * np.cos(phi)], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=E, nu=0.0, drill=1e-3)
    shell.thickness.set(t)
    fa = np.zeros(shell.Vf.n_dofs)
    fa[2::3] = -q
    shell.force.array = jnp.asarray(fa)
    diaph = lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], L)
    bcs = [DirichletBC(shell.Vu, 0.0, where=diaph, component=0),
           DirichletBC(shell.Vu, 0.0, where=diaph, component=2)]
    state, op, x = shell.solve(bcs)
    cu = shell.Vu.scalar_dof_coords
    tgt = np.array([R * np.sin(phi_max), L / 2, R * np.cos(phi_max)])
    i = np.argmin(np.linalg.norm(cu - tgt, axis=1))
    wz = float(np.asarray(shell.u.array).reshape(-1, 3)[i, 2])
    assert -0.31 < wz < -0.285, wz


def test_modal_analysis_cantilever_plate(cantilever):
    """First bending frequency of a cantilever plate strip vs beam theory:
    f1 = (1.875^2 / 2 pi) sqrt(EI / (rho A L^4)) (run_pav_shell_modal
    workload parity)."""
    from femo_tpu.models.shell import shell_modal_analysis
    from femo_tpu.fea.bc import DirichletBC

    shell, state, op, p = cantilever
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    freqs, modes = shell_modal_analysis(shell, bcs, n_modes=4)
    L, b, t, E = p["L"], p["b"], p["t"], p["E"]
    rho = shell.rho
    I = t**3 / 12  # per unit width
    f1_beam = (1.8751**2 / (2 * np.pi)) * np.sqrt(
        E * I / (rho * t * L**4))
    f1 = float(freqs[0])
    assert abs(f1 - f1_beam) / f1_beam < 0.03, (f1, f1_beam)
    # modes are mass-orthonormal-ish and finite
    assert np.isfinite(np.asarray(modes)).all()


def test_edge_loaded_cantilever_timoshenko():
    """Shell boundary (ds) edge traction — enabled by in-plane manifold
    facet normals/measures — vs Timoshenko cantilever theory
    delta = PL^3/(3EI) + PL/(ks G A)."""
    L, b, t, E, fz = 10.0, 1.0, 0.1, 1e6, 1e-4
    mesh = flat_plate(16, 2, L, b)
    mesh.mark_boundary_facets(1, predicate=lambda x: np.isclose(x[0], L))
    shell = RMShellModel(mesh, E=E, nu=0.0, edge_load_tag=1)
    shell.thickness.set(t)
    earr = np.zeros(shell.Vf.n_dofs)
    earr[2::3] = -fz  # per-length tip line load
    shell.edge_force.array = jnp.asarray(earr)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state, op, x = shell.solve(bcs)

    w = np.asarray(shell.u.array).reshape(-1, 3)[:, 2]
    tip = np.argmax(shell.Vu.scalar_dof_coords[:, 0])
    P = fz * b
    I = b * t**3 / 12
    G = E / 2.0
    A = b * t
    w_exact = -(P * L**3 / (3 * E * I) + P * L / (5.0 / 6.0 * G * A))
    np.testing.assert_allclose(w[tip], w_exact, rtol=5e-3)


def test_quad_shell_cantilever_and_scordelis_lo():
    """Quad-cell RM shell (reference PAV wing meshes are quad,
    run_pav_shell.py:84-85): cantilever vs beam theory and the
    Scordelis-Lo oracle on a biquadratic Q2/Q1 pairing."""
    # cantilever plate
    L, b, t, E, q = 10.0, 1.0, 0.1, 1e6, 1e-3
    m2 = create_rectangle_mesh(12, 2, 0, 0, L, b, cell_type="quad")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "quad")
    shell = RMShellModel(mesh, E=E, nu=0.0)
    shell.thickness.set(t)
    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = -q
    shell.force.array = jnp.asarray(farr)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state, op, x = shell.solve(bcs)
    w = np.asarray(shell.u.array).reshape(-1, 3)[:, 2]
    tip = np.argmax(shell.Vu.scalar_dof_coords[:, 0])
    I = t**3 / 12
    w_exact = -q * L**4 / (8 * E * I)
    np.testing.assert_allclose(w[tip], w_exact, rtol=5e-3)

    # Scordelis-Lo roof (16x16 quads: -0.2993 vs -0.3024 oracle)
    R, L, t, E, q = 25.0, 50.0, 0.25, 4.32e8, 90.0
    phi_max = np.deg2rad(40.0)
    n = 16
    m2 = create_rectangle_mesh(n, n, -phi_max, 0.0, phi_max, L,
                               cell_type="quad")
    phi, y = m2.coords[:, 0], m2.coords[:, 1]
    coords3 = np.stack([R * np.sin(phi), y, R * np.cos(phi)], axis=1)
    mesh = Mesh(coords3, m2.cells, "quad")
    shell = RMShellModel(mesh, E=E, nu=0.0, drill=1e-3)
    shell.thickness.set(t)
    fa = np.zeros(shell.Vf.n_dofs)
    fa[2::3] = -q
    shell.force.array = jnp.asarray(fa)
    diaph = lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], L)
    bcs = [DirichletBC(shell.Vu, 0.0, where=diaph, component=0),
           DirichletBC(shell.Vu, 0.0, where=diaph, component=2)]
    state, op, x = shell.solve(bcs)
    cu = shell.Vu.scalar_dof_coords
    tgt = np.array([R * np.sin(phi_max), L / 2, R * np.cos(phi_max)])
    i = np.argmin(np.linalg.norm(cu - tgt, axis=1))
    wz = float(np.asarray(shell.u.array).reshape(-1, 3)[i, 2])
    assert -0.31 < wz < -0.29, wz


def test_quad_shell_adjoint_thickness_fd():
    """IFT adjoint d(compliance)/d(thickness) on a QUAD shell mesh."""
    from femo_tpu.fea.assemble import compile_form

    L, b, t, E, q = 4.0, 1.0, 0.1, 1e6, 1e-3
    m2 = create_rectangle_mesh(6, 2, 0, 0, L, b, cell_type="quad")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "quad")
    shell = RMShellModel(mesh, E=E, nu=0.0)
    shell.thickness.set(t)
    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = -q
    shell.force.array = jnp.asarray(farr)
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state, op, x = shell.solve(bcs)
    ccf = compile_form(shell.compliance_form)

    def compliance_of_t(tarr):
        x = op({"thickness": tarr}, jax.lax.stop_gradient(state.current()))
        parts = state.split(x)
        return ccf.scalar({"u": parts["u"], "force": shell.force.array})

    t0 = shell.thickness.array
    val, g = jax.value_and_grad(compliance_of_t)(t0)
    h = 1e-6
    for i in [0, 3]:
        fp = float(compliance_of_t(t0.at[i].add(h)))
        fm = float(compliance_of_t(t0.at[i].add(-h)))
        fd = (fp - fm) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5)


def test_modal_lanczos_matches_dense(cantilever):
    """Scalable modal path: shift-invert Lanczos on the block-Thomas
    factorization reproduces the dense-eigh frequencies (so the modal
    variant reaches the same scale as the static stack,
    run_pav_shell_modal.py parity)."""
    from femo_tpu.models.shell import shell_modal_analysis

    shell, state, op, p = cantilever
    clamp = lambda x: np.isclose(x[0], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    f_d, m_d = shell_modal_analysis(shell, bcs, n_modes=4, method="dense")
    f_l, m_l = shell_modal_analysis(shell, bcs, n_modes=4, method="lanczos")
    np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_d), rtol=1e-7)
    # modes agree up to sign
    for j in range(4):
        a = np.asarray(m_d[:, j])
        bvec = np.asarray(m_l[:, j])
        c = abs(np.dot(a, bvec)) / (np.linalg.norm(a) * np.linalg.norm(bvec))
        assert c > 1.0 - 1e-6, (j, c)
