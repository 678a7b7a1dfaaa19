"""Dirichlet boundary conditions.

Replacement for dolfinx `dirichletbc` + `locate_dofs_geometrical` +
`apply_lifting`/`set_bc` (SURVEY.md N2; reference usage
/root/reference/examples/poisson_opt/run_poisson_opt.py:120-135, BC
application at femo/fea/utils_dolfinx.py:266-273).

Strong BCs are enforced by row masking: the constrained residual is
``R_c = where(free, R(u), u - g)`` and constrained operators act as the
identity on fixed dofs — equivalent to PETSc's zero-rows-and-columns with
unit diagonal.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from .space import FunctionSpace


class DirichletBC:
    """u = value on a set of dofs.

    Parameters
    ----------
    space : FunctionSpace
    value : scalar, array over selected dofs, or callable x -> value
    dofs : explicit dof indices, or
    where : geometric predicate ``lambda x: np.isclose(x[0], 0)`` with x of
        shape (gdim, n) — matching the reference's locate_dofs_geometrical
        lambdas.
    component : restrict to one vector component
    """

    def __init__(self, space: FunctionSpace, value=0.0, dofs=None,
                 where=None, component=None):
        self.space = space
        if dofs is None:
            if where is None:
                raise ValueError("need dofs or where")
            dofs = space.locate_dofs_geometrical(where, component=component)
        self.dofs = np.asarray(dofs, np.int32)
        if callable(value):
            coords = space.dof_coords()[self.dofs]
            vals = np.asarray(value(coords.T), float)
            self.values = np.broadcast_to(vals, (len(self.dofs),)).copy()
        else:
            self.values = np.broadcast_to(
                np.asarray(value, float), (len(self.dofs),)
            ).copy()


def bc_arrays(bcs, n_dofs: int):
    """Combine BCs into (free_mask (n,), bc_values (n,)) jnp arrays."""
    mask = np.ones(n_dofs, bool)
    vals = np.zeros(n_dofs)
    for bc in bcs or ():
        mask[bc.dofs] = False
        vals[bc.dofs] = bc.values
    from ..utils.arrays import asdev
    return jnp.asarray(mask), asdev(vals, config.dtype)


def apply_bc(u, free_mask, bc_values):
    """Force BC values onto a dof vector."""
    return jnp.where(free_mask, u, bc_values)


def constrain_residual(R, u, free_mask, bc_values):
    """R_c = R on free dofs; u - g on constrained dofs."""
    return jnp.where(free_mask, R, u - bc_values)
