"""Reference-API compatibility surface.

The reference's users wildcard-import everything
(`from femo.fea.fea_dolfinx import *`, SURVEY.md §1: "there is no curated
package-level API; users wildcard-import").  This module mirrors that import
surface name-for-name so a reference user can switch with minimal edits:

    from femo_tpu.compat import *

    mesh = createUnitSquareMesh(16)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V)
    fea = FEA(mesh)
    ...
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import config
from .fea import *  # noqa: F401,F403  (FEA, spaces, forms, assembly, BCs)
from .fea import Function, FunctionSpace
from .graph.model import FEAModel  # noqa: F401
from .graph.simulator import Simulator  # noqa: F401
from .graph.optimizer import OptimizationProblem, SLSQP, LBFGSB  # noqa: F401
from .io.xdmf import XDMFWriter as XDMFFile, Recorder  # noqa: F401
from .mesh.gmsh_io import import_mesh  # noqa: F401
from .solvers.linear import LinearSolver  # noqa: F401
from .solvers.newton import newton_solve as solveNonlinear  # noqa: F401


def getFuncArray(f) -> np.ndarray:
    """PETSc-vector extraction parity (utils_dolfinx.py:155-160)."""
    return np.asarray(f.array)


def setFuncArray(f, arr) -> None:
    """PETSc-vector insertion + ghostUpdate parity (utils_dolfinx.py:161-167);
    device arrays are single-source-of-truth here, so this is one assign."""
    f.array = jnp.asarray(np.asarray(arr), config.jdtype)


def getFormArray(form) -> np.ndarray:
    """Assemble a 1-form to numpy (utils_dolfinx.py parity)."""
    from .fea import assemble_vector

    return np.asarray(assemble_vector(form))


def VectorFunctionSpace(mesh, spec, dim: int | None = None) -> FunctionSpace:
    """dolfinx VectorFunctionSpace parity: vector-valued space with
    gdim components by default."""
    return FunctionSpace(mesh, spec, ncomp=dim or mesh.gdim)


def update(f, arr) -> None:
    """Reference `update` (utils_dolfinx.py:300-311) parity."""
    setFuncArray(f, arr)


def computePartials(form, wrt):
    """ufl.derivative + assemble parity (utils_dolfinx.py:313-314)."""
    from .fea.utils import compute_partials

    return compute_partials(form, wrt)
