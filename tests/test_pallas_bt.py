"""Pallas block-Thomas sweep kernels (ops/pallas_bt.py).

On CPU these run in interpret mode (bit-exact emulation of the kernel
semantics); the TPU-hardware timing lives in SCALE.json.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.ops.block_tridiag import BlockTridiagonalMatrix
from femo_tpu.ops.pallas_bt import bt_sweep_solve


def _synthetic(nb, B, seed=0):
    rng = np.random.default_rng(seed)
    D = np.tile(np.eye(B) * 4.0, (nb, 1, 1)) \
        + 0.02 * rng.standard_normal((nb, B, B))
    D = 0.5 * (D + np.swapaxes(D, 1, 2))
    L = (0.1 * rng.standard_normal((nb, B, B))).astype(np.float32)
    L[0] = 0
    U = np.swapaxes(np.roll(L, -1, axis=0), 1, 2).copy()
    U[-1] = 0
    n = nb * B
    return BlockTridiagonalMatrix(
        jnp.asarray(D, jnp.float32), jnp.asarray(L), jnp.asarray(U),
        np.arange(n), n), rng


@pytest.mark.parametrize("nb", [1, 3, 9])
def test_pallas_sweeps_match_scan(nb):
    B = 128
    mat, rng = _synthetic(nb, B)
    fac = mat.factor()
    b = jnp.asarray(rng.standard_normal(mat.n), jnp.float32)
    x_scan = np.asarray(fac.solve(b))
    interpret = jax.default_backend() != "tpu"
    x_pl = np.asarray(fac.solve_pallas(b, interpret=interpret))
    rel = (np.linalg.norm(x_pl - x_scan)
           / max(np.linalg.norm(x_scan), 1e-30))
    assert rel < 1e-6, rel
    # and it actually solves the system
    r = np.asarray(mat.matvec(jnp.asarray(x_pl))) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_pallas_sweep_direct_blocks():
    B = 128
    mat, rng = _synthetic(4, B, seed=3)
    fac = mat.factor()
    bb = jnp.asarray(rng.standard_normal((4, B)), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    xb = bt_sweep_solve(fac.Sinv, mat.L, fac.C, bb, interpret=interpret)
    assert xb.shape == (4, B) and xb.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(xb)))
