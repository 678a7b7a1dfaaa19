"""Pallas TPU kernels for the block-Thomas triangular sweeps.

The solve phase of the block-tridiagonal factorization (ops/block_tridiag
.py `BlockThomasFactor.solve`) is two length-nb sequential recurrences of
(B,B)@(B,) matvecs:

    fwd:  z_i = Sinv_i (b_i - L_i z_{i-1})
    bwd:  x_i = z_i - C_i x_{i+1}

Here each sweep is ONE Pallas kernel: the TPU grid is executed
sequentially, so the carry row lives in a VMEM scratch that persists
across grid steps while the BlockSpec pipeline double-buffers the next
Sinv/L/C block from HBM during the current step's matvecs — per-step
cost approaches the 64 KB block-stream bandwidth bound.

Measured on one TPU v5e chip (f32, B=128):
  - standalone (one dispatch per solve): 2.3x over the dispatched scan
    sweeps at nb=58 and nb=877 (838 us vs 1.9 ms, 1.5 ms vs 3.5 ms).
  - fused inside the jitted motor opt step (sweeps="pallas" on
    build_motor_jit_step), where the scan pays no dispatch: a consistent
    but small 2-3% end-to-end win at refine 0.5/1/2 with bit-identical
    f32 loss (refine<=1) and gradient deltas inside the known f32
    spread (4e-5 .. 2.6e-3) — the sweeps are not the dominant cost of
    the fused step.  Opt-in via sweeps="pallas"; the scan remains the
    default.

f32 only (Mosaic has no f64; the f64 path keeps the lax.scan sweeps).
No gathers, aligned (B is a multiple of 128 lanes) — this kernel runs on
real hardware, unlike the documented-infeasible ELL SpMV
(experiments/pallas_spmv.py).  The matvecs run at Precision.HIGHEST (full-f32
MXU passes): the sweeps are latency-bound so the extra passes are free,
making the kernel strictly more accurate than the default-precision
scan (solo-sweep agreement vs an f64 oracle is then limited by the f32
factor itself, 1.3e-3 before the PCG polish that production applies).

Replaces: the reference's MUMPS triangular solve phase
(femo/fea/utils_dolfinx.py:476-512 solveKSP_mumps) at the
latency-critical small/medium sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_contract_last = (((1,), (1,)), ((), ()))  # row @ M^T

# full-f32 MXU passes: the sweeps are latency-bound (one (B,B) block per
# sequential grid step), so the extra passes over single-pass bf16 are
# free — the kernel is strictly MORE accurate than the default-precision
# scan sweeps it replaces
_dot = partial(jax.lax.dot_general, dimension_numbers=_contract_last,
               preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)


def _fwd_kernel(b_ref, L_ref, Sinv_ref, z_ref, zcar):
    # row refs are (1, 1, B): Mosaic requires the last two block dims to
    # be (8k, 128k) or equal to the array dims, so rows ride a (nb, 1, B)
    # layout whose trailing (1, B) block IS the full trailing extent.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zcar[:] = jnp.zeros_like(zcar)

    t = b_ref[0] - _dot(zcar[:], L_ref[0])
    z = _dot(t, Sinv_ref[0])
    z_ref[0] = z
    zcar[:] = z


def _bwd_kernel(z_ref, C_ref, x_ref, xcar):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xcar[:] = jnp.zeros_like(xcar)

    x = z_ref[0] - _dot(xcar[:], C_ref[0])
    x_ref[0] = x
    xcar[:] = x


@partial(jax.jit, static_argnames=("interpret",))
def bt_sweep_solve(Sinv, L, C, bb, interpret: bool = False):
    """Both triangular sweeps as Pallas kernels.

    Sinv/L/C: (nb, B, B) f32;  bb: (nb, B) f32 (RCM-block layout).
    Returns x blocks (nb, B) f32.  Bit-for-bit this matches the scan
    sweeps up to f32 contraction order (MXU accumulates in f32).
    """
    nb, B = bb.shape
    bb3 = bb.reshape(nb, 1, B)
    row = pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0))
    rrow = pl.BlockSpec((1, 1, B), lambda i: (nb - 1 - i, 0, 0))
    blk = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0))
    rblk = pl.BlockSpec((1, B, B), lambda i: (nb - 1 - i, 0, 0))
    from jax.experimental.pallas import tpu as pltpu

    scratch = [pltpu.VMEM((1, B), jnp.float32)]
    z = pl.pallas_call(
        _fwd_kernel, grid=(nb,),
        in_specs=[row, blk, blk], out_specs=row,
        out_shape=jax.ShapeDtypeStruct((nb, 1, B), jnp.float32),
        scratch_shapes=scratch, interpret=interpret,
    )(bb3, L, Sinv)
    x = pl.pallas_call(
        _bwd_kernel, grid=(nb,),
        in_specs=[rrow, rblk], out_specs=rrow,
        out_shape=jax.ShapeDtypeStruct((nb, 1, B), jnp.float32),
        scratch_shapes=scratch, interpret=interpret,
    )(z, C)
    return x.reshape(nb, B)
