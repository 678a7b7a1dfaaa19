"""W2 parity: nonlinear Poisson (-lap u + u^3 = f) with Nitsche weak BCs.

Mirrors /root/reference/examples/nonlinear_poisson_opt/
run_nonlinear_poisson_opt.py: u^3 nonlinearity (:88-95), symmetric Nitsche
boundary residual (:97-116), SNES-style damped/line-search Newton (:221),
manufactured solution u_ex = sin(2 pi x) sin(pi y), f_ex = -div(grad u) + u^3
built symbolically (:144-169) — here via closed form.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from femo_tpu.fea import (
    FEA, FunctionSpace, Function, FormDef, dx, ds, grad, dot,
    create_unit_square_mesh, errorNorm,
)
from femo_tpu.graph.model import FEAModel
from femo_tpu.graph.simulator import Simulator

PI = np.pi
BETA = 10.0  # Nitsche penalty (reference beta_value=1e1)


def u_exact_np(x):
    return np.sin(2 * PI * x[0]) * np.sin(PI * x[1])


def u_exact_jnp(x):
    return jnp.sin(2 * PI * x[0]) * jnp.sin(PI * x[1])


def f_exact_np(x):
    # -lap(u_ex) + u_ex^3
    return 5 * PI**2 * np.sin(2 * PI * x[0]) * np.sin(PI * x[1]) \
        + u_exact_np(x) ** 3


def build(nel=16, sym=True):
    mesh = create_unit_square_mesh(nel)
    mesh.mark_boundary_facets(1)
    V = FunctionSpace(mesh, ("CG", 1))
    W = FunctionSpace(mesh, ("DG", 0))
    u, f = Function(V, "u"), Function(W, "f")
    sgn = 1.0 if sym else -1.0

    def interior(w, g):
        return dot(grad(w.u), grad(w.v)) + w.u**3 * w.v - w.f * w.v

    def boundary(w, g):
        ue = u_exact_jnp(g.x)
        nitsche_1 = -dot(grad(w.u), g.n) * w.v
        nitsche_2 = sgn * (ue - w.u) * dot(grad(w.v), g.n)
        penalty = BETA / g.h * (w.u - ue) * w.v
        r = nitsche_1 + nitsche_2
        if sym:
            r = r + penalty
        return r

    residual = FormDef([dx(interior), ds(boundary, tag=1)],
                       coeffs=[u, f], test=V)

    u_ex = Function(V, "u_ex").interpolate(u_exact_np)
    obj = FormDef(
        [dx(lambda w, g: 0.5 * (w.u - w.u_ex) ** 2 + 3e-7 * w.f**2)],
        coeffs=[u, u_ex, f])

    fea = FEA(mesh)
    fea.PDE_SOLVER = "SNES"  # backtracking line search
    fea.add_input("f", f)
    fea.add_state("u", u, residual, ["f"])
    fea.add_output("J", "scalar", obj, ["u", "f"])
    return fea, u, f, u_ex


def test_forward_nitsche_manufactured():
    fea, u, f, u_ex = build(16, sym=True)
    f_src = Function(f.space).interpolate(f_exact_np)
    fea.solve("u", {"f": f_src.array})
    err = errorNorm(u_ex, u)
    assert err < 0.03, err  # O(h^2) for CG1 at h=1/16 with |u|~1

    # mesh convergence: error drops ~4x on refinement
    fea2, u2, f2, u_ex2 = build(32, sym=True)
    f_src2 = Function(f2.space).interpolate(f_exact_np)
    fea2.solve("u", {"f": f_src2.array})
    err2 = errorNorm(u_ex2, u2)
    assert err2 < err / 2.8, (err, err2)


@pytest.mark.parametrize("sym", [True, False])
def test_nitsche_gradients_fd(sym):
    """Gradient parity through the Nitsche facet terms (reference validates
    symmetric-Nitsche gradients, SURVEY.md build step 2)."""
    fea, u, f, u_ex = build(6, sym=sym)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=f.space.n_dofs, val=1.0)
    model.add_design_variable("f")
    model.add_objective("J")
    sim = Simulator(model)
    sim.run()
    rep = sim.check_totals("J", "f", step=1e-6, compact_print=False)
    # one-sided FD truncation limits agreement to ~1e-6 relative
    assert rep[("J", "f")]["rel_error"] < 5e-6
