"""Linear solver dispatch with boundary-condition-constrained operators.

Replacement for the reference's KSP zoo (`solveKSP`, `solveKSP_mumps`,
`setUpKSP_MUMPS`, /root/reference/femo/fea/utils_dolfinx.py:451-512) and for
MUMPS direct factorization (SURVEY.md N5, "hard part" #1).

Three factorization backends behind one interface:

* ``dense``  — densify the element matrix and LU-factor on device.  On TPU a
  dense LU of a few-thousand-dof system runs on the MXU and is *faster* than
  a sparse direct solve on CPU; this is the MUMPS replacement for small/medium
  problems (beams, shells, coarse meshes).
* ``cg`` / ``bicgstab`` / ``gmres`` — device Krylov with Jacobi or block-
  Jacobi preconditioning, for large problems.
* ``scipy`` — host sparse LU (robust fallback; not differentiable, used only
  inside custom_vjp-wrapped solves where AD never traces through it).

The constrained operator is ``A_c = P A P + (I - P)`` with P the projector
onto free dofs — identical in effect to PETSc's zero-row/col BC application.
Both forward and transpose solves are provided (the adjoint needs A^T,
reference fea_dolfinx.py:192-222).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fea.assemble import ElementMatrix
from .krylov import KRYLOV


def constrained_matvec(matvec: Callable, free: jnp.ndarray):
    def mv(x):
        xf = jnp.where(free, x, 0.0)
        y = matvec(xf)
        return jnp.where(free, y, x)

    return mv


class Factorization:
    """Solve/solve_t interface over a factorized constrained operator."""

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def solve_t(self, b: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError


class DenseFactorization(Factorization):
    def __init__(self, emat: ElementMatrix, free: jnp.ndarray):
        A = emat.to_dense()
        freef = free.astype(A.dtype)
        A = A * freef[:, None] * freef[None, :]
        A = A + jnp.diag(1.0 - freef)
        self.lu = jax.scipy.linalg.lu_factor(A)

    def solve(self, b):
        return jax.scipy.linalg.lu_solve(self.lu, b)

    def solve_t(self, b):
        return jax.scipy.linalg.lu_solve(self.lu, b, trans=1)


class KrylovFactorization(Factorization):
    def __init__(self, emat: ElementMatrix, free: jnp.ndarray, method: str,
                 pc: str | None, rtol, atol, maxiter):
        self.mv = constrained_matvec(emat.matvec, free)
        self.mvt = constrained_matvec(emat.rmatvec, free)
        self.method = method
        self.rtol, self.atol, self.maxiter = rtol, atol, maxiter
        if pc == "jacobi":
            d = emat.diagonal()
            d = jnp.where(free, d, 1.0)
            d = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
            dinv = 1.0 / d
            self.M = lambda x: dinv * x
        elif pc and pc.startswith("chebyshev"):
            # "chebyshev" or "chebyshev:<degree>". Cuts outer Krylov
            # iterations ~6x at degree 8 (latency-bound reductions go down);
            # total matvec count is similar to Jacobi — its main role is as
            # a smoother (and future multigrid level smoother).
            from .precond import chebyshev_preconditioner

            deg = int(pc.split(":")[1]) if ":" in pc else 5
            d = emat.diagonal()
            d = jnp.where(free, d, 1.0)
            self.M = chebyshev_preconditioner(self.mv, d, degree=deg)
        else:
            self.M = None
        self.last_result = None

    def solve(self, b):
        res = KRYLOV[self.method](self.mv, b, M=self.M, rtol=self.rtol,
                                  atol=self.atol, maxiter=self.maxiter)
        self.last_result = res
        return res.x

    def solve_t(self, b):
        res = KRYLOV[self.method](self.mvt, b, M=self.M, rtol=self.rtol,
                                  atol=self.atol, maxiter=self.maxiter)
        self.last_result = res
        return res.x


class ScipyLUFactorization(Factorization):
    """Host sparse direct LU — the literal MUMPS-role fallback."""

    def __init__(self, emat: ElementMatrix, free: jnp.ndarray):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        A = emat.to_scipy_csr()
        freem = np.asarray(free)
        P = sp.diags(freem.astype(A.dtype))
        Ac = (P @ A @ P + sp.diags((~freem).astype(A.dtype))).tocsc()
        self._lu = spla.splu(Ac)
        self._dtype = config.jdtype

    def solve(self, b):
        x = self._lu.solve(np.asarray(b))
        return jnp.asarray(x, self._dtype)

    def solve_t(self, b):
        x = self._lu.solve(np.asarray(b), trans="T")
        return jnp.asarray(x, self._dtype)


class LinearSolver:
    """Configurable linear solver (KSP-options parity).

    method: "auto" | "dense" | "cg" | "bicgstab" | "gmres" | "scipy"
    "auto" picks dense direct below ``config.dense_direct_max_dofs`` and
    bicgstab (or cg if symmetric=True) above.
    """

    def __init__(self, method: str = "auto", pc: str | None = "jacobi",
                 symmetric: bool = False, rtol: float | None = None,
                 atol: float | None = None, maxiter: int | None = None):
        self.method = method
        self.pc = pc
        self.symmetric = symmetric
        self.rtol = config.krylov_rtol if rtol is None else rtol
        self.atol = config.krylov_atol if atol is None else atol
        self.maxiter = config.krylov_maxiter if maxiter is None else maxiter

    def resolve_method(self, n: int) -> str:
        if self.method != "auto":
            return self.method
        if n <= config.dense_direct_max_dofs:
            return "dense"
        return "cg" if self.symmetric else "bicgstab"

    def factor(self, emat: ElementMatrix, free: jnp.ndarray) -> Factorization:
        method = self.resolve_method(emat.shape[0])
        if method == "dense":
            return DenseFactorization(emat, free)
        if method == "scipy":
            return ScipyLUFactorization(emat, free)
        if method == "block_thomas":
            # RCM + block-tridiagonal Thomas direct solve (O(n B^2),
            # MXU scans) — the scalable structured direct option
            from ..ops.block_tridiag import BlockTridiagFactorization

            return BlockTridiagFactorization(emat, free)
        if method.endswith("_bt"):
            # Krylov preconditioned by the block-Thomas factor (the f32
            # TPU pattern: rough structured factor + few Krylov iters)
            from ..ops.block_tridiag import BlockTridiagFactorization

            bt = BlockTridiagFactorization(emat, free)
            kf = KrylovFactorization(emat, free, method[:-3], None,
                                     self.rtol, self.atol, self.maxiter)
            kf.M = bt._f.solve
            kf._bt = bt  # keep transpose path alive
            orig_solve_t = kf.solve_t

            def solve_t(b):
                if bt._ft is None:
                    bt.solve_t(jnp.zeros_like(b))  # build transpose factor
                kf.M = bt._ft.solve
                try:
                    return orig_solve_t(b)
                finally:
                    kf.M = bt._f.solve

            kf.solve_t = solve_t
            return kf
        return KrylovFactorization(emat, free, method, self.pc, self.rtol,
                                   self.atol, self.maxiter)
