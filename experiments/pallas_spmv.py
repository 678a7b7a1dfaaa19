"""Pallas TPU kernels for the SpMV hot loop — and what they taught us.

The framework's sparse operator is the unassembled element form
(ElementMatrix, femo_tpu/fea/assemble.py): y = scatter_add(A_e @ x[cols]).
XLA implements this as gather -> batched matmul -> sort-based scatter,
measured ~100x off HBM speed-of-light on v5e (1.85 ms element-form /
1.02 ms ELL at 16.6k dofs where the data is ~2 MB).

Hardware findings (v5e, Mosaic as of jax 0.9):
* arbitrary-index gathers do not lower (`Only 2D gather is supported` /
  shape-mismatch for the take_along_axis form) — the ELL and fused
  element-form kernels below therefore run in INTERPRET mode only;
* arbitrary-offset slices don't lower either (`Slice shape along
  dimension 1 must be aligned to tiling (128)` — both for lane-dim slices
  and for (N, 1)-shaped buffers), which rules out the shifted-window
  banded kernel on hardware in any layout we found (lanes-last, sublane
  blocks, (W,1) scratch + manual DMA all hit the same tiling rule).

The production consequence is architectural, not a kernel: eliminate the
gathers from the FORMAT.  `femo_tpu/ops/block_tridiag.py` (RCM + block-
tridiagonal layout) turns SpMV into three batched MXU matmuls (0.64 ms
measured) and yields the block-Thomas structured direct solver.  The
kernels here remain as interpret-validated references for when Mosaic
grows dynamic-gather support.

DEMOTED from femo_tpu/ops to experiments/ in round 4 (VERDICT r3 weak 3):
no workload or solver path imports these kernels — the block-tridiagonal
matvec beat ELL SpMV in round 1 and the hardware blockers above stand.
Self-test (interpret mode, CPU):  PYTHONPATH=/root/repo:/root/.axon_site
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/pallas_spmv.py
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp



def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def ell_from_element_matrix(emat, n_rows=None):
    """Convert an ElementMatrix to padded ELL (row-major sparse) arrays.

    Returns (vals (n, k), cols (n, k)) with k = max nonzeros/row, built
    host-side once per Jacobian (scipy CSR intermediary).
    """
    import scipy.sparse as sp

    A = emat.to_scipy_csr()
    n = A.shape[0]
    k = int(np.diff(A.indptr).max())
    vals = np.zeros((n, k), np.asarray(A.data).dtype)
    cols = np.zeros((n, k), np.int32)
    for i in range(n):
        s, e = A.indptr[i], A.indptr[i + 1]
        vals[i, : e - s] = A.data[s:e]
        cols[i, : e - s] = A.indices[s:e]
    return jnp.asarray(vals), jnp.asarray(cols)


def ell_spmv_reference(vals, cols, x):
    """XLA reference: y_i = sum_k vals[i,k] * x[cols[i,k]]."""
    return jnp.sum(vals * x[cols], axis=1)


def ell_spmv_pallas(vals, cols, x, block_rows: int = 512,
                    interpret: bool | None = None):
    """Pallas ELL SpMV: per row-tile, gather x in VMEM and reduce.

    vals/cols: (n, k); x: (m,). Rows are tiled over the grid; the x vector
    is resident in VMEM (fits easily for the target problem sizes).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    n, k = vals.shape
    nb = -(-n // block_rows)
    npad = nb * block_rows
    vals_p = _pad_to(vals, npad)
    cols_p = _pad_to(cols, npad)

    def kernel(x_ref, vals_ref, cols_ref, y_ref):
        # Mosaic supports 2D row-gathers: gather rows of (m, 1) x by a flat
        # index vector, then reshape back to the (rows, k) tile
        xv = x_ref[:]  # (m, 1)
        v = vals_ref[:]
        c = cols_ref[:].reshape(-1)
        xg = xv[c, :].reshape(v.shape)
        y_ref[:] = jnp.sum(v * xg, axis=1, keepdims=True)

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x, whole vector
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), vals.dtype),
        interpret=interpret,
    )(x[:, None], vals_p, cols_p)
    return y[:n, 0]


def element_spmv_pallas(A_e, cols_e, x, n_rows, rows_e,
                        block_elems: int = 256,
                        interpret: bool | None = None):
    """Fused gather -> batched small matmul for element-form SpMV.

    A_e (ne, nr, nc), cols_e (ne, nc), rows_e (ne, nr): computes per-element
    contributions y_e = A_e @ x[cols_e] inside VMEM tiles (gather + einsum
    fused per tile), then scatters with segment_sum (XLA) — the scatter
    remains outside because its target is the full dof vector.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    ne, nr, nc = A_e.shape
    nb = -(-ne // block_elems)
    npad = nb * block_elems
    A_p = _pad_to(A_e, npad)
    c_p = _pad_to(cols_e, npad)

    def kernel(x_ref, A_ref, c_ref, y_ref):
        xv = x_ref[:]  # (m, 1)
        c = c_ref[:].reshape(-1)
        xe = xv[c, :].reshape(c_ref.shape)  # (be, nc) gather in VMEM
        y_ref[:] = jnp.einsum(
            "eij,ej->ei", A_ref[:], xe,
            preferred_element_type=A_ref.dtype)

    ye = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_elems, nr, nc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_elems, nc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_elems, nr), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, nr), A_e.dtype),
        interpret=interpret,
    )(x[:, None], A_p, c_p)
    ye = ye[:ne]
    return jax.ops.segment_sum(
        ye.reshape(-1), rows_e.reshape(-1), num_segments=n_rows)


class PallasELLOperator:
    """Drop-in matvec built from an ElementMatrix, ELL-packed once."""

    def __init__(self, emat, interpret: bool | None = None):
        self.vals, self.cols = ell_from_element_matrix(emat)
        self.shape = emat.shape
        self.interpret = interpret

    def matvec(self, x):
        return ell_spmv_pallas(self.vals, self.cols, x,
                               interpret=self.interpret)


# ---------------------------------------------------------------------------
# Banded SpMV (gather-free) — the Pallas kernel that actually lowers on TPU.
#
# Mosaic cannot lower arbitrary-index gathers (the ELL/element kernels above
# run in interpret mode only; on hardware, use BlockTridiagonalMatrix for
# the MXU path).  A banded matrix after RCM reordering needs NO gathers:
# y[i] = sum_d band[i, d] * x[i + d - b].  Per row-tile the kernel DMAs the
# overlapping x window [i*R, i*R + R + 2b) from HBM into VMEM and reduces
# with static lane shifts — pure VPU work.
# ---------------------------------------------------------------------------


def banded_from_element_matrix(emat, free=None):
    """(band (n, 2b+1), bandwidth b, perm) after RCM reordering."""
    import scipy.sparse as sp

    from femo_tpu import native

    A = emat.to_scipy_csr()
    n = A.shape[0]
    if free is not None:
        fr = np.asarray(free)
        P = sp.diags(fr.astype(A.dtype))
        A = (P @ A @ P + sp.diags((~fr).astype(A.dtype))).tocsr()
    perm = native.rcm_order(A.indptr.astype(np.int64),
                            A.indices.astype(np.int32))
    Ap = A[perm][:, perm].tocoo()
    b = int(np.abs(Ap.row - Ap.col).max()) if Ap.nnz else 1
    band = np.zeros((n, 2 * b + 1), np.asarray(Ap.data).dtype)
    band[Ap.row, Ap.col - Ap.row + b] = Ap.data
    return jnp.asarray(band), b, np.asarray(perm)


def banded_spmv_pallas(band, x, bandwidth: int, block_rows: int = 1024,
                       interpret: bool | None = None):
    """y[i] = sum_d band[i, d] * x[i + d - b], no gathers.

    band (n, 2b+1); x (n,) in the SAME (RCM) ordering as band.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    n, nb_ = band.shape
    b = bandwidth
    R = block_rows
    nblocks = -(-n // R)
    npad = nblocks * R
    band_p = _pad_to(band, npad)
    # x padded by b at the front; window length rounded up to a multiple
    # of R (Mosaic requires DMA slice lengths aligned to the 1D tiling)
    W = 2 * R
    assert 2 * b < R, "bandwidth must be < block_rows/2"
    xp = jnp.pad(x, (b, W))  # generous tail padding keeps windows in-bounds

    def kernel(x_hbm, band_ref, y_ref, xs, sem):
        # keep index math in int32: under jax_enable_x64 a Python-int
        # multiply promotes to i64, which Mosaic cannot lower
        i = pl.program_id(0)
        off = i * jnp.int32(R)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, W)], xs, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((R, 1), band_ref.dtype)
        for d in range(nb_):
            # static ref slices (offsets known at trace time) — the
            # form Mosaic lowers; no gathers, no dynamic_slice
            acc = acc + band_ref[:, d : d + 1] * xs[d : d + R]
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((R, nb_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), band.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, 1), band.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp[:, None], band_p)
    return y[:n, 0]


# ---------------------------------------------------------------------------
# Self-test (the former tests/test_pallas_ops.py, kept runnable after the
# demotion to experiments/): interpret-mode parity of every kernel vs the
# production ElementMatrix matvec on a CG1 stiffness operator.
# ---------------------------------------------------------------------------

def _selftest():
    from femo_tpu.fea import (
        FormDef, Function, FunctionSpace, assemble_matrix,
        create_unit_square_mesh, dot, dx, grad,
    )
    from femo_tpu.solvers.krylov import cg

    mesh = create_unit_square_mesh(8)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    form = FormDef([dx(lambda w, g: dot(grad(w.u), grad(w.v)))],
                   coeffs=[u], test=V)
    A = assemble_matrix(form, "u")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=V.n_dofs))
    y_ref = np.asarray(A.matvec(x))

    vals, cols = ell_from_element_matrix(A)
    np.testing.assert_allclose(
        np.asarray(ell_spmv_reference(vals, cols, x)), y_ref, atol=1e-12)
    op = PallasELLOperator(A, interpret=True)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), y_ref, atol=1e-12)
    b0 = A.blocks[0]
    np.testing.assert_allclose(
        np.asarray(element_spmv_pallas(b0.A, b0.cols, x, V.n_dofs, b0.rows,
                                       interpret=True)), y_ref, atol=1e-12)
    band, bw, perm = banded_from_element_matrix(A)
    xp = x[perm]
    yb = np.asarray(banded_spmv_pallas(band, xp, bw, interpret=True))
    np.testing.assert_allclose(yb, y_ref[perm], atol=1e-12)

    def mv(v):
        return op.matvec(v) + v  # SPD shift

    b = jnp.asarray(rng.normal(size=V.n_dofs))
    res = cg(mv, b, rtol=1e-10)
    assert bool(res.converged)
    r = np.asarray(b - mv(res.x))
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b))
    print("pallas_spmv selftest: all kernels match the ElementMatrix "
          "matvec (interpret mode)")


if __name__ == "__main__":
    _selftest()
