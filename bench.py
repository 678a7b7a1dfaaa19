"""Benchmark: EM-motor optimization iteration wall-clock (north-star metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures one full opt iteration of the W5 motor workload, fully jitted on
device: mesh-motion solve (2 continuation steps x 3 Newton) + nonlinear
magnetostatics (3 load steps x 3 Newton, piecewise B-H law) + B-power
functionals + IFT adjoint through both states — exactly the reference's
per-iteration cost structure (BASELINE.md: >= 7 SNES solves x (FFCx
assembly + MUMPS LU) + dRdu/dRdf assembly + 2 MUMPS transpose solves on
the CPU reference stack).  Linear solves use the RCM block-tridiagonal
Thomas factorization (MXU scans) polished by fixed-count PCG.

vs_baseline: the reference publishes no perf numbers (BASELINE.md /
SURVEY.md section 6), so the denominator is a MEASURED same-machine CPU
proxy of the reference pipeline (eager per-iteration assembly + scipy splu
sparse-direct Newton/continuation + assembled IFT adjoint, f64, identical
mesh and continuation schedule) recorded in BASELINE_MEASURED.json by
bench_baseline.py.  Falls back to a declared 500 ms estimate only if that
artifact is missing; the JSON's `baseline` field states which was used.
"""

import json
import os
import time


def main():
    import jax

    from femo_tpu.config import set_precision

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # v5e has no native f64; bench the f32 compute path (f64 accuracy
        # paths are exercised on CPU in the test suite)
        set_precision("float32")

    from femo_tpu.models.motor.model import build_motor_jit_step

    # full north-star mesh resolution (refine=1: 4608 cells, 4896+2448
    # dofs); block-Thomas structured factorization + fixed-count PCG polish
    # (8x faster than dense at this size, matches f64 losses to 0.02%)
    step, (dv0, iq0), d = build_motor_jit_step(
        refine=1, em_load_steps=3, mm_newton_iters=3, em_newton_iters=3,
        factorization="block_thomas" if on_tpu else "lu")

    val, grads = step(dv0, iq0)  # compile + warmup
    val.block_until_ready()

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        val, grads = step(dv0, iq0)
    val.block_until_ready()
    dt_ms = (time.perf_counter() - t0) / n_rep * 1e3

    meas_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(meas_path):
        with open(meas_path) as fh:
            rec = json.load(fh)
        baseline_ms = float(rec["baseline_ms"])
        provenance = rec["provenance"]
    else:
        baseline_ms = 500.0
        provenance = "estimate: no BASELINE_MEASURED.json (run bench_baseline.py)"
    print(json.dumps({
        "metric": "motor_opt_iter_ms",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / dt_ms, 3),
        "baseline": {"ms": baseline_ms, "provenance": provenance},
    }))


if __name__ == "__main__":
    main()
