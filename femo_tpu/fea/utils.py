"""Misc FEA utilities (errorNorm, partial assembly helpers).

Parity with scattered helpers in /root/reference/femo/fea/utils_dolfinx.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .assemble import assemble_scalar, assemble_vector, compile_form
from .forms import FormDef, dx, grad
from .space import Function


def error_norm(f_ref: Function, f: Function, norm: str = "L2") -> float:
    """L2 or H1 error norm between two Functions on the same space
    (reference errorNorm, utils_dolfinx.py:225-237)."""
    V = f.space
    a = Function(V, "a", f_ref.array)
    b = Function(V, "b", f.array)

    if norm == "L2":
        def integrand(w, g):
            d = w.a - w.b
            return jnp.sum(jnp.asarray(d) ** 2)
    else:  # H1 seminorm + L2
        def integrand(w, g):
            d = w.a - w.b
            gd = grad(w.a) - grad(w.b)
            return jnp.sum(jnp.asarray(d) ** 2) + jnp.sum(gd**2)

    form = FormDef([dx(integrand)], coeffs=[a, b])
    return float(jnp.sqrt(assemble_scalar(form)))


errorNorm = error_norm


def compute_partials(form: FormDef, wrt: str, values: dict | None = None):
    """dJ/d(coefficient) of a scalar functional — `ufl.derivative` +
    assemble parity (utils_dolfinx.py:216-222, 313-314) via jax.grad."""
    import jax

    cf = compile_form(form)
    v = form.values()
    if values:
        v.update(values)

    def f(x):
        vv = dict(v)
        vv[wrt] = x
        return cf.scalar(vv)

    return jax.grad(f)(v[wrt])


assemble_partials = compute_partials
