"""L2 projection onto nodal spaces.

Parity with the reference `project` (lumped or consistent mass,
/root/reference/femo/fea/utils_dolfinx.py:549-583) used by field outputs
(fea_dolfinx.py:224-225, output_model.py:122-159).

A field-output form is a 1-form against the target space's test function:
``dx(lambda w, g: expr(w, g) * w.v)``.  Projection solves M p = b; with
mass lumping p = b / rowsum(M), fully differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import config
from .assemble import compile_form
from .forms import FormDef, dx
from .space import FunctionSpace


_MASS_CACHE: dict[int, jnp.ndarray] = {}


def lumped_mass(space: FunctionSpace) -> jnp.ndarray:
    """Row-sum lumped mass vector of the space (cached per space)."""
    key = id(space)
    if key not in _MASS_CACHE:
        if space.ncomp == 1:
            form = FormDef([dx(lambda w, g: w.v)], coeffs=[], test=space)
        else:
            form = FormDef(
                [dx(lambda w, g: jnp.sum(w.v.val))], coeffs=[], test=space)
        cf = compile_form(form)
        _MASS_CACHE[key] = cf.vector_jit()({})
    return _MASS_CACHE[key]


def project_form(form: FormDef, space: FunctionSpace, values: dict,
                 lump_mass: bool = True) -> jnp.ndarray:
    """Project the 1-form onto `space` (which must be its test space)."""
    cf = compile_form(form)
    b = cf.vector_jit()(values)
    if lump_mass:
        return b / lumped_mass(space)
    # consistent mass via CG (SPD, Jacobi-preconditioned)
    from ..solvers.krylov import cg

    if space.ncomp == 1:
        mform = FormDef([dx(lambda w, g: w.p * w.v)],
                        coeffs=[_dummy(space, "p")], test=space)
    else:
        mform = FormDef([dx(lambda w, g: jnp.sum(w.p.val * w.v.val))],
                        coeffs=[_dummy(space, "p")], test=space)
    mcf = compile_form(mform)
    mv = lambda x: mcf.vector_jit()({"p": x})
    ml = lumped_mass(space)
    res = cg(mv, b, M=lambda x: x / ml, rtol=1e-12)
    return res.x


def _dummy(space, name):
    from .space import Function

    return Function(space, name)
