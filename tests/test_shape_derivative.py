"""W10 parity: shape derivatives dJ/d(mesh coords) vs finite differences
(ufl_shape_derivatives.py analogue)."""

import numpy as np
import pytest
import jax.numpy as jnp

from femo_tpu.fea import (
    FunctionSpace, Function, FormDef, dx, ds, grad, dot,
    create_unit_square_mesh,
)
from femo_tpu.fea.shape import shape_gradient, shape_functional
from femo_tpu.fea.assemble import compile_form


def test_volume_shape_gradient_exact():
    """J = \\int 1 dx: dJ/dx is the boundary-normal area form; interior
    node motion changes nothing. Checked against FD."""
    mesh = create_unit_square_mesh(4)
    V = FunctionSpace(mesh, ("CG", 1))
    one = Function(V, "one")
    one.set(1.0)
    form = FormDef([dx(lambda w, g: w.one * 1.0)], coeffs=[one])
    g = np.asarray(shape_gradient(form))
    J = shape_functional(form)
    coords = jnp.asarray(mesh.coords)
    vals = form.values()
    h = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(4):
        i = rng.integers(mesh.n_nodes)
        d = rng.integers(2)
        cp = coords.at[i, d].add(h)
        cm = coords.at[i, d].add(-h)
        fd = (float(J(cp, vals)) - float(J(cm, vals))) / (2 * h)
        np.testing.assert_allclose(g[i, d], fd, atol=1e-7)
    # interior nodes: zero shape gradient for the volume functional
    interior = ~(
        np.isclose(mesh.coords[:, 0], 0) | np.isclose(mesh.coords[:, 0], 1)
        | np.isclose(mesh.coords[:, 1], 0) | np.isclose(mesh.coords[:, 1], 1))
    np.testing.assert_allclose(g[interior], 0.0, atol=1e-12)


def test_energy_shape_gradient_fd():
    """Dirichlet-energy functional with a frozen state field: full FD check
    including the facet term."""
    mesh = create_unit_square_mesh(3)
    mesh.mark_boundary_facets(1)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u").interpolate(lambda x: x[0] ** 2 + 0.5 * x[1])

    form = FormDef(
        [dx(lambda w, g: dot(grad(w.u), grad(w.u))),
         ds(lambda w, g: 0.1 * w.u * g.h, tag=1)],
        coeffs=[u])
    g = np.asarray(shape_gradient(form))
    J = shape_functional(form)
    coords = jnp.asarray(mesh.coords)
    vals = form.values()
    h = 1e-6
    rng = np.random.default_rng(1)
    checked = 0
    for _ in range(6):
        i = rng.integers(mesh.n_nodes)
        d = rng.integers(2)
        cp = coords.at[i, d].add(h)
        cm = coords.at[i, d].add(-h)
        fd = (float(J(cp, vals)) - float(J(cm, vals))) / (2 * h)
        np.testing.assert_allclose(g[i, d], fd, rtol=2e-5, atol=1e-8)
        checked += 1
    assert checked == 6


def test_interior_facet_shape_gradient_fd():
    """Shape gradient of an interior-facet (dS) functional vs FD — normals
    and measures differentiate through both sides' cell geometry."""
    from femo_tpu.fea import dS
    from femo_tpu.fea.forms import avg

    mesh = create_unit_square_mesh(3)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u").interpolate(lambda x: x[0] ** 2 - 0.3 * x[1])

    form = FormDef(
        [dS(lambda w, g: (avg(w.u) + 0.2 * g.n[0]) ** 2)], coeffs=[u])
    g = np.asarray(shape_gradient(form))
    J = shape_functional(form)
    coords = jnp.asarray(mesh.coords)
    vals = form.values()
    h = 1e-6
    rng = np.random.default_rng(2)
    for _ in range(6):
        i = rng.integers(mesh.n_nodes)
        d = rng.integers(2)
        cp = coords.at[i, d].add(h)
        cm = coords.at[i, d].add(-h)
        fd = (float(J(cp, vals)) - float(J(cm, vals))) / (2 * h)
        np.testing.assert_allclose(g[i, d], fd, rtol=2e-5, atol=1e-8)
