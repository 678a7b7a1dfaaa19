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


def find_node_indices(node_coordinates, coordinates) -> np.ndarray:
    """Nearest-mesh-node lookup via cKDTree (reference findNodeIndices,
    utils_dolfinx.py:587-595)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(node_coordinates, float))
    _, idx = tree.query(np.asarray(coordinates, float))
    return np.atleast_1d(idx).astype(np.int32)


findNodeIndices = find_node_indices


def locate_dofs_polar(space, radius: float, angle_range=None,
                      atol: float = 1e-9, component=None) -> np.ndarray:
    """Dofs on a circle of given radius, optionally within an angular
    window (reference locateDOFs, utils_dolfinx.py:617-641: polar ->
    cartesian edge dof lookup for the motor's moved boundaries)."""
    c = space.scalar_dof_coords
    r = np.hypot(c[:, 0], c[:, 1])
    mask = np.isclose(r, radius, atol=atol)
    if angle_range is not None:
        th = np.arctan2(c[:, 1], c[:, 0])
        lo, hi = angle_range
        mask &= (th >= lo) & (th <= hi)
    ids = np.nonzero(mask)[0]
    ncomp = space.ncomp
    if ncomp == 1:
        return ids.astype(np.int32)
    if component is None:
        return ((ids[:, None] * ncomp + np.arange(ncomp)[None, :])
                .reshape(-1).astype(np.int32))
    return (ids * ncomp + component).astype(np.int32)


locateDOFs = locate_dofs_polar


def move(mesh, displacement):
    """Return a NEW mesh with displaced coordinates (reference move/
    moveBackward, utils_dolfinx.py:514-528, mutate dolfinx geometry in
    place; here meshes are functional — compiled forms keep their original
    geometry, so build new spaces/forms on the moved mesh).

    displacement: (n_nodes, gdim) array, flat CG1 vector-dof array, or
    callable x(gdim, n) -> (gdim, n).
    """
    from ..mesh.mesh import Mesh

    coords = np.asarray(mesh.coords)
    if callable(displacement):
        d = np.asarray(displacement(coords.T)).T
    else:
        d = np.asarray(displacement)
        if d.ndim == 1:
            d = d.reshape(-1, mesh.gdim)
    out = Mesh(coords + d, mesh.cells.copy(), mesh.cell_type,
               None if mesh.cell_tags is None else mesh.cell_tags.copy())
    out._facet_tag_array = mesh.facet_tags.copy()
    return out
