"""Reference wildcard-import surface (`from femo_tpu.compat import *`)."""

import numpy as np


def test_compat_surface_poisson():
    from femo_tpu.compat import (
        FEA, Function, FunctionSpace, VectorFunctionSpace, TestFunction,
        createUnitSquareMesh, getFuncArray, setFuncArray, errorNorm,
        FormDef, dx, grad, dot,
    )

    mesh = createUnitSquareMesh(6)
    V = FunctionSpace(mesh, ("CG", 1))
    Vv = VectorFunctionSpace(mesh, ("CG", 1))
    assert Vv.ncomp == 2
    u = Function(V, "u")
    f = Function(FunctionSpace(mesh, ("DG", 0)), "f")
    setFuncArray(f, np.full(f.space.n_dofs, 2.0))
    np.testing.assert_allclose(getFuncArray(f), 2.0)

    fea = FEA(mesh)
    res = FormDef([dx(lambda w, g: dot(grad(w.u), grad(w.v)) - w.f * w.v)],
                  coeffs=[u, f], test=V)
    fea.add_input("f", f)
    fea.add_state("u", u, res, ["f"])
    fea.add_strong_bc(0.0, [lambda x: np.isclose(x[0], 0)
                            | np.isclose(x[0], 1) | np.isclose(x[1], 0)
                            | np.isclose(x[1], 1)], V)
    fea.solve("u")
    assert np.abs(getFuncArray(u)).max() > 0
