"""Element tabulation sanity: partition of unity, gradient consistency,
quadrature exactness (Basix-replacement validation, SURVEY.md N3)."""

import numpy as np
import pytest

from femo_tpu.elements.element import Element
from femo_tpu.elements.quadrature import cell_rule


CASES = [
    ("P", 1, "interval"), ("P", 2, "interval"), ("P", 3, "interval"),
    ("P", 1, "triangle"), ("P", 2, "triangle"),
    ("P", 1, "quad"), ("P", 2, "quad"),
    ("P", 1, "tet"), ("P", 2, "tet"), ("P", 1, "hex"),
]


@pytest.mark.parametrize("family,deg,cell", CASES)
def test_partition_of_unity(family, deg, cell):
    el = Element(cell, family, deg)
    pts, _ = cell_rule(cell, 3)
    N, dN = el.tabulate(pts)
    assert N.shape == (len(pts), el.nscalar_dofs)
    np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("family,deg,cell", CASES)
def test_gradient_finite_difference(family, deg, cell):
    el = Element(cell, family, deg)
    rng = np.random.default_rng(0)
    dim = el.dim
    pts = rng.uniform(0.2, 0.4, size=(5, dim))
    N, dN = el.tabulate(pts)
    eps = 1e-6
    for d in range(dim):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += eps
        pm[:, d] -= eps
        Np, _ = el.tabulate(pp)
        Nm, _ = el.tabulate(pm)
        fd = (Np - Nm) / (2 * eps)
        np.testing.assert_allclose(dN[:, :, d], fd, atol=1e-7)


def test_hermite_interpolates_cubics():
    """Hermite element reproduces cubic polynomials exactly."""
    el = Element("interval", "Hermite", 3)
    t = np.linspace(0, 1, 7)[:, None]
    N, dN = el.tabulate(t)
    # u(x) = x^3 - 2x^2 + 4: dofs (u(0), u'(0), u(1), u'(1))
    u = lambda x: x**3 - 2 * x**2 + 4
    du = lambda x: 3 * x**2 - 4 * x
    dofs = np.array([u(0), du(0), u(1), du(1)])
    np.testing.assert_allclose(N @ dofs, u(t[:, 0]), atol=1e-12)
    np.testing.assert_allclose(dN[:, :, 0] @ dofs, du(t[:, 0]), atol=1e-12)


@pytest.mark.parametrize("cell,deg,exact", [
    ("interval", 3, 1 / 4),    # x^3 on [0,1]
    ("triangle", 3, 1 / 20),   # x^3 on ref triangle
    ("quad", 3, 1 / 4),
    ("tet", 2, 1 / 60),        # x^2 on ref tet
    ("hex", 2, 1 / 3),
])
def test_quadrature_exactness(cell, deg, exact):
    pts, wts = cell_rule(cell, deg)
    p = deg if cell not in ("tet",) else 2
    val = (wts * pts[:, 0] ** p).sum()
    np.testing.assert_allclose(val, exact, rtol=1e-12)


def test_high_degree_conical_quadrature():
    """Degree > 5 triangle / > 2 tet rules are exact (conical product);
    previously requests silently downgraded (ADVICE r1)."""
    from math import factorial

    for deg in (4, 6, 8, 10):
        pts, wts = cell_rule("triangle", deg)
        for p in range(deg + 1):
            q = deg - p
            exact = factorial(p) * factorial(q) / factorial(p + q + 2)
            np.testing.assert_allclose(
                (wts * pts[:, 0] ** p * pts[:, 1] ** q).sum(), exact,
                rtol=1e-12, atol=1e-15)
    for deg in (3, 4, 6):
        pts, wts = cell_rule("tet", deg)
        for p in range(deg + 1):
            q = deg - p
            exact = factorial(p) * factorial(q) / factorial(p + q + 3)
            np.testing.assert_allclose(
                (wts * pts[:, 0] ** p * pts[:, 1] ** q).sum(), exact,
                rtol=1e-12, atol=1e-15)
