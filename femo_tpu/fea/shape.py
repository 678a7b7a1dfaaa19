"""Shape derivatives: dJ/d(mesh coordinates) by AD through the geometry.

Parity with the reference's shape-derivative snippet (workload W10,
/root/reference/examples/ongoing/shape_opt/ufl_shape_derivatives.py:15-22:
`ufl.derivative(form, SpatialCoordinate, Argument)`).  Here the mesh
coordinates — normally baked into the compiled terms as constants — are
re-threaded as a traced input via the term-data override mechanism, and the
shape gradient is one `jax.grad` of the assembled functional.

Covers cell, exterior-facet, and interior-facet integrals (facet normals and
measures derive from the cell geometry Jacobian, so threading the cell
coordinates captures the full sensitivity; the cell-diameter `g.h` is also
recomputed so Nitsche-type terms carry their full geometric sensitivity).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from .assemble import CompiledForm, compile_form
from .forms import FormDef


def _term_data_from_coords(term, coords):
    """Rebuild a term's geometric entity data from traced coordinates."""
    mesh = term.form.mesh
    d = SimpleNamespace()
    cells = jnp.asarray(mesh.cells[np.asarray(term.cells0)])
    d.coords0 = coords[cells]  # (ne, nv, gdim)
    # cell diameter = max pairwise vertex distance (traced)
    pts = d.coords0
    diff = pts[:, :, None, :] - pts[:, None, :, :]
    d.h = jnp.sqrt(jnp.max(jnp.sum(diff**2, axis=-1), axis=(1, 2)))
    d.tag = term.tag
    d.gdofs0 = term.gdofs0
    if term.domain == "exterior_facet":
        d.cent0 = jnp.mean(d.coords0, axis=1)
        d.var0 = term.var0
        d.ctag0 = term.ctag0
    elif term.domain == "interior_facet":
        # normals/measures derive from the side-0 geometry Jacobian, so
        # threading both sides' coordinates captures the full sensitivity
        d.cent0 = jnp.mean(d.coords0, axis=1)
        d.var0 = term.var0
        d.ctag0 = term.ctag0
        cells1 = jnp.asarray(mesh.cells[np.asarray(term.cells1)])
        d.coords1 = coords[cells1]
        d.var1 = term.var1
        d.ctag1 = term.ctag1
        d.gdofs1 = term.gdofs1
    return d


def shape_functional(form: FormDef):
    """Return J(coords, values) — the functional with mesh coordinates as a
    traced argument."""
    cf = compile_form(form)

    def J(coords, values):
        vals = {k: values[k] for k in cf.all_names}
        total = jnp.zeros((), config.jdtype)
        for t in cf.terms:
            total = total + t.scalar(vals, _term_data_from_coords(t, coords))
        return total

    return J


def shape_gradient(form: FormDef, values: dict | None = None) -> jnp.ndarray:
    """dJ/d(coords): (n_nodes, gdim) nodal shape gradient of a scalar
    functional (values default to the form's coefficient arrays)."""
    cf = compile_form(form)
    J = shape_functional(form)
    v = form.values()
    if values:
        v.update(values)
    coords = jnp.asarray(cf.mesh.coords, config.jdtype)
    return jax.grad(J)(coords, v)
