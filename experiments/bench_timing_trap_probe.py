"""Does bench.py's timing loop hit the axon dedup trap?

tpu_f64_blockops.py found that on the axon remote platform,
jax.block_until_ready can return ~instantly for repeated identical
calls whose results were never fetched.  bench.py / bench_scale.py's
_time_step uses exactly that pattern (warmup, n_rep identical calls,
ONE block_until_ready on the last result) — if the runtime dedupes,
every headline step time is underreported by ~n_rep.

This probe times the refine=1 motor opt-iteration three ways:
  a) bench.py's current pattern (identical args, fetch last);
  b) identical args, np.asarray(val) every iteration (forced fetch —
     adds one host round trip per rep);
  c) VARIED inputs (dv perturbed per rep), fetch last — distinct
     executions with no per-rep sync, the async-pipeline-preserving fix.

If (a) ~= (c) the bench pattern is safe (the dedup needs conditions the
step's result-graph doesn't meet); if (a) << (c) every bench number
must switch to pattern (c).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/bench_timing_trap_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from femo_tpu.config import set_precision

if jax.devices()[0].platform != "cpu":
    set_precision("float32")

from femo_tpu.models.motor.model import build_motor_jit_step

N_REP = 5


def main():
    step, (dv0, iq0), d = build_motor_jit_step(
        refine=1, em_load_steps=3, mm_newton_iters=3, em_newton_iters=3,
        refactor_every=3, factorization="block_thomas")

    # warmup/compile
    val, grads = step(dv0, iq0)
    np.asarray(val)

    out = {}

    # a) bench.py pattern: identical args, fetch only the last result
    t0 = time.perf_counter()
    for _ in range(N_REP):
        val, grads = step(dv0, iq0)
    val.block_until_ready()
    out["a_identical_fetch_last_ms"] = (time.perf_counter() - t0) / N_REP * 1e3

    # b) identical args, forced fetch per rep
    t0 = time.perf_counter()
    for _ in range(N_REP):
        val, grads = step(dv0, iq0)
        np.asarray(val)
    out["b_identical_fetch_each_ms"] = (time.perf_counter() - t0) / N_REP * 1e3

    # c) varied inputs, fetch last
    dvs = [dv0 + 1e-9 * (i + 1) for i in range(N_REP)]
    [d.block_until_ready() for d in dvs]
    t0 = time.perf_counter()
    for i in range(N_REP):
        val, grads = step(dvs[i], iq0)
    val.block_until_ready()
    out["c_varied_fetch_last_ms"] = (time.perf_counter() - t0) / N_REP * 1e3

    out["n_rep"] = N_REP
    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "experiments",
                           "bench_timing_trap_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
