"""Latency-floor experiment for the motor opt iteration (VERDICT r2 weak 3).

At refine<=1 the step is latency- not flop-bound: 15 Newton bodies, each a
length-nb sequential Thomas scan (factor + 2 triangular sweeps) plus an
8-iteration PCG polish whose preconditioner application is 2 more sweeps —
~2*(1+8)*nb sequential (B,B) matvec steps per Newton body at B=128.

Candidate levers measured here on real TPU hardware (f32 compute path):
  - factor_method="cr": block cyclic reduction — ceil(log2 nb) BATCHED
    levels for both the factor and the solve, vs the length-nb scan.
    Risk: CR's reduced systems amplify f32 roundoff (it broke the PCG
    polish on the cond~6.6e7 shell composite) — so each variant's loss is
    checked against the refine-matched f64 CPU oracle loss recorded below.
  - sweeps="pallas": VMEM-carry sweep kernels (known ~2-3%).
  - pcg_iters: 8 (validated default) vs 4/12 — accuracy column decides.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/motor_latency.py
Writes one JSON line per variant; does NOT touch SCALE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_step(step, args, n_rep=10):
    val, grads = step(*args)
    val.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_rep):
        val, grads = step(*args)
    val.block_until_ready()
    return (time.perf_counter() - t0) / n_rep * 1e3, float(val), grads


def main():
    import jax

    from femo_tpu.config import set_precision

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        set_precision("float32")

    import numpy as np

    from femo_tpu.models.motor.model import build_motor_jit_step

    # f64 oracle losses per refine (computed once on CPU with dense LU via
    # experiments/motor_latency_oracle.py; refine -> loss)
    oracle = {
        0.5: None, 1: None, 2: None,
    }
    oracle_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "motor_latency_oracle.json")
    if os.path.exists(oracle_path):
        with open(oracle_path) as fh:
            oracle.update({float(k): v for k, v in json.load(fh).items()})

    refines = [float(x) for x in
               os.environ.get("REFINES", "0.5,1,2").split(",")]
    variants = [
        ("thomas_pcg8", dict(factor_method="thomas", pcg_iters=8)),
        ("thomas_pcg4", dict(factor_method="thomas", pcg_iters=4)),
        ("cr_pcg8", dict(factor_method="cr", pcg_iters=8)),
        ("cr_pcg4", dict(factor_method="cr", pcg_iters=4)),
        ("thomas_pcg8_pallas", dict(factor_method="thomas", pcg_iters=8,
                                    sweeps="pallas")),
        # Shamanskii: factor once per load step (5 factors vs 15); the
        # PCG polish runs against the fresh operator so accuracy holds
        # (CPU f64: loss shift 2.4e-6 rel at refine=0.5)
        ("thomas_pcg8_re3", dict(factor_method="thomas", pcg_iters=8,
                                 refactor_every=3)),
        ("thomas_pcg4_re3", dict(factor_method="thomas", pcg_iters=4,
                                 refactor_every=3)),
        # larger blocks: nb ~ n/B sequential scan steps -> fewer, fatter
        # steps.  The per-step (B,B) ops stay MXU-trivial while the scan
        # chain (the refine<=1 latency floor) shortens ~B/128 x
        ("thomas_pcg8_re3_B256", dict(factor_method="thomas", pcg_iters=8,
                                      refactor_every=3, block_size=256)),
        ("thomas_pcg8_re3_B384", dict(factor_method="thomas", pcg_iters=8,
                                      refactor_every=3, block_size=384)),
        ("thomas_pcg8_re3_B512", dict(factor_method="thomas", pcg_iters=8,
                                      refactor_every=3, block_size=512)),
        ("thomas_pcg4_re3_B512", dict(factor_method="thomas", pcg_iters=4,
                                      refactor_every=3, block_size=512)),
        # classical Shamanskii: freeze fill AND factor between refactor
        # points — the stage attribution says the step is ASSEMBLY-
        # dominated (mm fill 3.7 ms x 7 calls of the 89 ms step), so
        # skipping 2/3 of the fills is the biggest single lever
        ("thomas_pcg8_re3_frozen", dict(factor_method="thomas",
                                        pcg_iters=8, refactor_every=3,
                                        freeze_operator=True)),
        ("thomas_pcg8_re3_frozen_B256", dict(factor_method="thomas",
                                             pcg_iters=8, refactor_every=3,
                                             freeze_operator=True,
                                             block_size=256)),
        ("thomas_pcg4_re3_frozen", dict(factor_method="thomas",
                                        pcg_iters=4, refactor_every=3,
                                        freeze_operator=True)),
    ]
    names = os.environ.get("VARIANTS")
    if names:
        keep = set(names.split(","))
        variants = [v for v in variants if v[0] in keep]

    for refine in refines:
        ref_loss = oracle.get(refine)
        for name, kw in variants:
            if kw.get("sweeps") == "pallas" and not on_tpu:
                continue
            try:
                step, (dv0, iq0), d = build_motor_jit_step(
                    refine=refine, em_load_steps=3, mm_newton_iters=3,
                    em_newton_iters=3, factorization="block_thomas",
                    design_space="edge_deltas", **kw)
                dt_ms, loss, _ = _time_step(step, (dv0, iq0))
                rel = (abs(loss - ref_loss) / abs(ref_loss)
                       if ref_loss else None)
                print(json.dumps({
                    "refine": refine, "variant": name,
                    "ms": round(dt_ms, 2), "loss": loss,
                    "loss_rel_err_vs_f64": rel,
                }), flush=True)
            except Exception as e:  # keep the sweep going
                print(json.dumps({"refine": refine, "variant": name,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
