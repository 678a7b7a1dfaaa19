"""Measure the CPU reference-proxy baseline for bench.py.

The reference publishes no performance numbers (SURVEY.md §6), and FEniCSx
is not installable in this image, so the honest denominator (VERDICT r1
item 4) is a measured same-machine CPU proxy with the reference's exact
per-iteration cost structure (BASELINE.md / SURVEY.md §3.3):

  per opt iteration:
    forward  = mesh-motion continuation (displacement-stepped Newton) +
               EM load-stepped Newton, each Newton iteration doing a full
               residual+Jacobian assembly and a sparse-direct factor+solve
               (scipy splu standing in for MUMPS,
                /root/reference/femo/fea/utils_dolfinx.py:476-493)
    adjoint  = dRdu/dRdf assembly + transpose factorized solves through
               both chained states (state_model.py:117-218)

run on the host CPU in float64 through this repo's eager graph layer
(Simulator.run + compute_totals), at the same mesh resolution and
continuation schedule as bench.py's device path.

Writes BASELINE_MEASURED.json; bench.py reads it and reports provenance.
Run manually on the bench machine:  python bench_baseline.py
"""

import json
import os
import platform
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")
# BASELINE_REFINES=1,2 measures the proxy at several sizes: the refine>1
# rungs feed the bench ladder's vs_64core_ideal margin curve (the
# crossover against the idealized 64-core reference is size-dependent)
EM_LOAD_STEPS = 3


def _measure(refine) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from femo_tpu.graph.simulator import Simulator
    from femo_tpu.models.motor import build_motor_model
    from femo_tpu.solvers.linear import LinearSolver

    model, d = build_motor_model(
        refine=refine, em_load_steps=EM_LOAD_STEPS,
        linear_solver=LinearSolver(method="scipy"))
    sim = Simulator(model)
    sim["shape_dv"] = np.array([5e-4, 3e-4])

    # warmup: trace/compile all assembly kernels (the reference pays FFCx
    # codegen once at first form(); excluded from per-iteration cost there
    # and here)
    sim.run()
    sim.compute_totals("loss_sum", ["iq", "shape_dv"])

    n_rep = 3 if refine <= 1 else 2
    t0 = time.perf_counter()
    for k in range(n_rep):
        # perturb the dv so every iteration re-solves from a new design
        # point (warm-started state, like the reference across SNOPT iters)
        sim["shape_dv"] = np.array([5e-4, 3e-4]) * (1.0 + 0.02 * (k + 1))
        sim.run()
        sim.compute_totals("loss_sum", ["iq", "shape_dv"])
    dt_ms = (time.perf_counter() - t0) / n_rep * 1e3

    return {
        "baseline_ms": round(dt_ms, 3),
        "provenance": (
            "measured: same-machine CPU proxy of the reference pipeline "
            "(eager per-iteration assembly + scipy splu sparse-direct "
            "Newton/continuation + assembled-matrix IFT adjoint, f64), "
            "femo_tpu eager graph layer at identical mesh/continuation"),
        "workload": "em_motor opt-iteration (forward + adjoint)",
        "config": {
            "refine": refine,
            "em_load_steps": EM_LOAD_STEPS,
            "linear_solver": "scipy_splu",
            "dtype": "float64",
            "n_rep": n_rep,
        },
        "machine": {
            "platform": platform.platform(),
            "processor": platform.processor(),
            "cpu_count": os.cpu_count(),
        },
    }


def main():
    if os.environ.get("_BASELINE_CHILD") == "1":
        rec = _measure(float(os.environ.get("_BASELINE_REFINE", "1")))
        print(json.dumps(rec))
        return
    # re-exec with a scrubbed CPU env (the axon sitecustomize forces the
    # TPU platform unless PALLAS_AXON_POOL_IPS is cleared)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_BASELINE_CHILD"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    refines = [float(x) for x in
               os.environ.get("BASELINE_REFINES", "1").split(",")]
    # merge into the existing record: the refine-4 proxy (154 s/iter,
    # measured round 3) is too expensive to re-run casually and must
    # survive partial re-measures
    rec = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rec = json.load(f)
    for refine in refines:
        env["_BASELINE_REFINE"] = str(refine)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=REPO, stdout=subprocess.PIPE, text=True,
            timeout=14400)
        if proc.returncode != 0:
            raise RuntimeError(f"baseline child failed rc={proc.returncode}")
        one = json.loads(proc.stdout.strip().splitlines()[-1])
        if refine == 1:
            rec.update(one)
        else:
            tag = str(int(refine)) if refine == int(refine) else str(refine)
            rec[f"baseline_ms_refine{tag}"] = one["baseline_ms"]
            rec[f"baseline_ms_refine{tag}_provenance"] = (
                one["provenance"] + f"; refine={refine}, "
                f"n_rep={one['config']['n_rep']}")
        print(f"refine={refine}: {one['baseline_ms']} ms/iter", flush=True)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
