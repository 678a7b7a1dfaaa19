"""Block-tridiagonal operators and the block-Thomas direct solver.

The TPU-native scalable MUMPS replacement (SURVEY.md N5, "hard part" #1).
After RCM reordering (femo_tpu.native), a FEM matrix has bandwidth b; with
block size B >= b (rounded to a multiple of 128 for the MXU) the matrix is
exactly block-tridiagonal:

    A = tridiag(L_i, D_i, U_i),   B x B dense blocks.

* matvec: three batched (B,B)@(B,) products — pure MXU, no gathers (the
  gather-based SpMV that XLA generates is ~100x off speed-of-light on TPU;
  this layout removes the gathers entirely).
* factor/solve: block Thomas — a lax.scan of block inverses and matmuls,
  O(n B^2) memory and O(n_blocks B^3) flops (linear in n, vs n^3 for the
  dense LU), all MXU work.  No inter-block pivoting (standard for
  elliptic FEM operators; intra-block solves pivot normally).

Everything is jittable; the factorization is a pytree and slots into the
custom_vjp implicit ops (forward solve reused transposed for the adjoint).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class BlockTridiagonalMatrix:
    """Block-tridiagonal form of a sparse matrix after RCM reordering.

    Built host-side from an ElementMatrix (or scipy CSR).  Stores the
    new-to-old permutation so callers work in original dof ordering.
    """

    def __init__(self, D, L, U, perm, n: int):
        self.D = D  # (nb, B, B)
        self.L = L  # (nb, B, B)  L[0] unused
        self.U = U  # (nb, B, B)  U[-1] unused
        self.perm = perm  # new-to-old (len n_pad, first n valid)
        self.n = n
        self.nb, self.B = D.shape[0], D.shape[1]
        # old-to-new inverse permutation
        inv = np.zeros(len(perm), np.int32)
        inv[np.asarray(perm)] = np.arange(len(perm), dtype=np.int32)
        self.iperm = jnp.asarray(inv)
        self.perm_j = jnp.asarray(np.asarray(perm, np.int32))

    # -- construction -----------------------------------------------------------
    @classmethod
    def from_element_matrix(cls, emat, free=None, block: int | None = None):
        """Build from ElementMatrix; optional BC row/col masking
        (constrained operator: identity on fixed dofs)."""
        import scipy.sparse as sp

        from .. import native

        A = emat.to_scipy_csr()
        n = A.shape[0]
        if free is not None:
            fr = np.asarray(free)
            P = sp.diags(fr.astype(A.dtype))
            A = (P @ A @ P + sp.diags((~fr).astype(A.dtype))).tocsr()
        perm = native.rcm_order(A.indptr.astype(np.int64),
                                A.indices.astype(np.int32))
        Ap = A[perm][:, perm].tocoo()
        bw = int(np.abs(Ap.row - Ap.col).max()) if Ap.nnz else 1
        if block is None:
            block = max(128, _round_up(bw, 128))
        B = block
        n_pad = _round_up(n, B)
        nb = n_pad // B
        D = np.zeros((nb, B, B), np.asarray(Ap.data).dtype)
        Lb = np.zeros_like(D)
        Ub = np.zeros_like(D)
        bi = Ap.row // B
        bj = Ap.col // B
        li = Ap.row % B
        lj = Ap.col % B
        for arr, sel in ((D, bi == bj), (Lb, bi == bj + 1),
                         (Ub, bi + 1 == bj)):
            arr[(bi[sel] if arr is not Ub else bi[sel]),
                li[sel], lj[sel]] = Ap.data[sel]
        if not np.all((np.abs(bi - bj) <= 1)):
            raise ValueError(
                f"bandwidth {bw} exceeds block {B}: not block-tridiagonal")
        # identity on padding rows
        for i in range(n, n_pad):
            D[i // B, i % B, i % B] = 1.0
        perm_full = np.concatenate(
            [np.asarray(perm, np.int64), np.arange(n, n_pad)])
        f = config.jdtype
        return cls(jnp.asarray(D, f), jnp.asarray(Lb, f), jnp.asarray(Ub, f),
                   perm_full, n)

    # -- vector permutation helpers ----------------------------------------------
    def to_blocks(self, x):
        n_pad = self.nb * self.B
        xp = jnp.zeros(n_pad, x.dtype).at[: self.n].set(x)
        return xp[self.perm_j].reshape(self.nb, self.B)

    def from_blocks(self, xb):
        xp = xb.reshape(-1)[self.iperm]
        return xp[: self.n]

    # -- matvec --------------------------------------------------------------------
    def matvec(self, x):
        xb = self.to_blocks(x)
        y = jnp.einsum("bij,bj->bi", self.D, xb,
                       preferred_element_type=xb.dtype)
        xm = jnp.roll(xb, 1, axis=0).at[0].set(0.0)
        xp = jnp.roll(xb, -1, axis=0).at[-1].set(0.0)
        y = y + jnp.einsum("bij,bj->bi", self.L, xm,
                           preferred_element_type=xb.dtype)
        y = y + jnp.einsum("bij,bj->bi", self.U, xp,
                           preferred_element_type=xb.dtype)
        return self.from_blocks(y)

    # -- block Thomas factorization ---------------------------------------------
    def factor(self):
        """Forward elimination: S_i = D_i - L_i C_{i-1}; stores S_i^{-1}
        and C_i = S_i^{-1} U_i.  One lax.scan of MXU inverses/matmuls."""

        def step(C_prev, blocks):
            D_i, L_i, U_i = blocks
            S = D_i - L_i @ C_prev
            Sinv = jnp.linalg.inv(S)
            C = Sinv @ U_i
            return C, (Sinv, C)

        B = self.B
        C0 = jnp.zeros((B, B), self.D.dtype)
        _, (Sinv, C) = jax.lax.scan(step, C0, (self.D, self.L, self.U))
        return BlockThomasFactor(self, Sinv, C)

    def factor_t(self):
        """Factorization of A^T (for adjoint solves)."""
        At = BlockTridiagonalMatrix(
            jnp.swapaxes(self.D, 1, 2),
            # A^T lower block i = U_{i-1}^T
            jnp.roll(jnp.swapaxes(self.U, 1, 2), 1, axis=0),
            jnp.roll(jnp.swapaxes(self.L, 1, 2), -1, axis=0),
            np.asarray(self.perm_j), self.n)
        return At.factor()


@dataclass
class BlockThomasFactor:
    mat: BlockTridiagonalMatrix
    Sinv: jnp.ndarray  # (nb, B, B)
    C: jnp.ndarray  # (nb, B, B)

    def solve_refined(self, b, refine: int = 0):
        """Solve with optional iterative refinement.

        In f64 the direct solve is accurate (refine=0).  In f32 the
        sequential block elimination can lose enough accuracy that
        refinement DIVERGES (||I - F^-1 A|| > 1 for stiff operators) —
        use the factor as a Krylov preconditioner instead (measured: PCG
        converges in ~18 iterations at 16.6k dofs where refinement fails)."""
        x = self.solve(b)
        for _ in range(refine):
            r = b - self.mat.matvec(x)
            x = x + self.solve(r)
        return x

    def solve(self, b):
        m = self.mat
        bb = m.to_blocks(b)

        def fwd(z_prev, args):
            b_i, L_i, Sinv_i = args
            z = jnp.einsum("ij,j->i", Sinv_i,
                           b_i - jnp.einsum("ij,j->i", L_i, z_prev))
            return z, z

        z0 = jnp.zeros(m.B, bb.dtype)
        _, z = jax.lax.scan(fwd, z0, (bb, m.L, self.Sinv))

        def bwd(x_next, args):
            z_i, C_i = args
            x = z_i - jnp.einsum("ij,j->i", C_i, x_next)
            return x, x

        _, xr = jax.lax.scan(bwd, jnp.zeros(m.B, bb.dtype), (z, self.C),
                             reverse=True)
        return m.from_blocks(xr)


class BlockTridiagFactorization:
    """Factorization-interface adapter (solvers.linear.Factorization)."""

    def __init__(self, emat, free, refine: int = 0):
        self.mat = BlockTridiagonalMatrix.from_element_matrix(emat, free)
        self._f = self.mat.factor()
        self._ft = None
        self._mat_t = None
        self.refine = refine

    def solve(self, b):
        return self._f.solve_refined(b, self.refine)

    def solve_t(self, b):
        if self._ft is None:
            self._mat_t = BlockTridiagonalMatrix(
                jnp.swapaxes(self.mat.D, 1, 2),
                jnp.roll(jnp.swapaxes(self.mat.U, 1, 2), 1, axis=0),
                jnp.roll(jnp.swapaxes(self.mat.L, 1, 2), -1, axis=0),
                np.asarray(self.mat.perm_j), self.mat.n)
            self._ft = self._mat_t.factor()
        x = self._ft.solve(b)
        for _ in range(self.refine):
            r = b - self._mat_t.matvec(x)
            x = x + self._ft.solve(r)
        return x
