"""Where does the TPU f64 block-op cost live? (emulation microbenchmark)

The f64 block-Thomas factor recursion costs 8.9 ms PER B=128 step on
TPU (SCALE fsi_factor_probe roofline) vs ~0.2 ms in f32 — an emulation
penalty that gates every f64 workload rung (thin shell 19.1 s step,
modal 243 s, motor f64 parity 12.9 s).  This probe decomposes the
sequential per-step cost inside a lax.scan (the production shape) by
building the step up one op at a time, f64, plus the mixed-precision
step (f32 Cholesky-inverse seed + one f64 Newton-Schulz refinement —
see ops/block_tridiag._inv_block_mixed).

Measured on TPU v5e (2026-08-19, B=128, scan len 256):
    1 f64 matmul            0.147 ms/step   <- f64 matmuls ride the MXU
    + f64 cholesky          7.16  ms/step   <- the bottleneck (scalar
    + f64 solve_triangular  8.81  ms/step      emulation)
    full factor step        8.89  ms/step
    mixed f32chol + 1 NS    0.21  ms/step   <- 43x, chain stays f64
    full f32 step           0.20  ms/step   (same speed as mixed)

TIMING TRAP (cost an hour): on the axon remote platform,
jax.block_until_ready can return ~instantly for repeated identical
calls whose results were never fetched — ALWAYS force np.asarray(out)
(or vary the inputs) when microbenchmarking through the tunnel.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python \
      experiments/tpu_f64_blockops.py
Writes experiments/tpu_f64_blockops.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

jax.config.update("jax_enable_x64", True)

HI = jax.lax.Precision.HIGHEST


def main():
    rows = []
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)

    for B, nscan in ((128, 256), (512, 32)):
        A = rng.standard_normal((nscan, B, B))
        S = A @ np.swapaxes(A, -1, -2) + B * np.eye(B)

        def bench(name, step, dt):
            D = jnp.asarray(S, dt)
            L = jnp.asarray(0.01 * A, dt)
            f = jax.jit(lambda D, L: jax.lax.scan(
                step, jnp.zeros((B, B), D.dtype), (D, L))[0])
            _ = np.asarray(f(D, L))  # warm + force execution
            best = float("inf")
            for _i in range(2):
                t0 = time.perf_counter()
                _ = np.asarray(f(D, L))  # np.asarray: see TIMING TRAP
                best = min(best, time.perf_counter() - t0)
            row = dict(B=B, step=name, dtype=str(np.dtype(dt)),
                       per_step_ms=round(best / nscan * 1e3, 4),
                       scan_len=nscan, platform=platform)
            rows.append(row)
            print(json.dumps(row), flush=True)

        def mm1(C_prev, blocks):
            D_i, L_i = blocks
            return D_i - jnp.matmul(L_i, C_prev, precision=HI), ()

        def chol_step(C_prev, blocks):
            D_i, L_i = blocks
            Sb = D_i - jnp.matmul(L_i, C_prev, precision=HI)
            Lc = jnp.linalg.cholesky(Sb)
            return jnp.matmul(Lc, L_i, precision=HI), ()

        def full_step(C_prev, blocks):
            D_i, L_i = blocks
            Sb = D_i - jnp.matmul(L_i, C_prev, precision=HI)
            Lc = jnp.linalg.cholesky(Sb)
            eye = jnp.eye(B, dtype=Sb.dtype)
            Linv = solve_triangular(Lc, eye, lower=True)
            Sinv = jnp.matmul(Linv.T, Linv, precision=HI)
            return jnp.matmul(Sinv, L_i, precision=HI), ()

        def mixed_step(C_prev, blocks):
            D_i, L_i = blocks
            Sb = D_i - jnp.matmul(L_i, C_prev, precision=HI)
            S32 = Sb.astype(jnp.float32)
            Lc = jnp.linalg.cholesky(S32)
            eye32 = jnp.eye(B, dtype=jnp.float32)
            Linv = solve_triangular(Lc, eye32, lower=True)
            X0 = jnp.matmul(Linv.T, Linv,
                            precision=HI).astype(jnp.float64)
            R = (jnp.eye(B, dtype=jnp.float64)
                 - jnp.matmul(Sb, X0, precision=HI))
            X1 = X0 + jnp.matmul(X0, R, precision=HI)
            return jnp.matmul(X1, L_i, precision=HI), ()

        bench("1_matmul", mm1, jnp.float64)
        bench("matmul+cholesky", chol_step, jnp.float64)
        bench("full_factor_step", full_step, jnp.float64)
        bench("mixed_f32chol_1ns", mixed_step, jnp.float64)
        bench("full_factor_step", full_step, jnp.float32)

    out_path = os.path.join(REPO, "experiments", "tpu_f64_blockops.jsonl")
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
