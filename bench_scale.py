"""Scale benchmarks: reference-scale shell solve+adjoint and motor
refine-scaling rows (VERDICT r1 item 3).

Run on the bench machine:  python bench_scale.py [--quick]
Writes SCALE.json with one row per configuration:
  - CG2CG1 cantilever-wing shell thickness->compliance step (assembly +
    block-Thomas solve + IFT adjoint, fully jitted on device) at ~146k
    composite dofs — the reference's eVTOL wing scale is 107,695 tri
    elements under MPI+MUMPS (run_aeroelasticity_static_w_feedback.py:55).
    Runs in f64 (emulated on TPU): the RM composite is intrinsically too
    ill-conditioned for f32 (measured: Jacobi-scaled cond 6.6e7, so
    eps_f32 * cond > 1 — NO f32 solver can produce a meaningful answer;
    an earlier f32 row was fast but 6 orders of magnitude wrong).  The
    adjoint reuses the forward factorization (symmetric energy Hessian).
  - Motor opt-iteration at refine = 0.5 / 1 / 2 in f32 (VERDICT: show the
    block-Thomas path's scaling, not just the refine=1 point).  The f32
    motor loss is validated against f64 to 0.02% (bench.py).

Each section runs in a subprocess so its precision config (x64 flag) is
process-clean.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _time_step(step, args, n_rep=5):
    out = step(*args)
    ((out[0] if isinstance(out, tuple) else out)).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = step(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.perf_counter() - t0) / n_rep * 1e3


def run_shell(quick: bool):
    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from femo_tpu.models.shell import build_shell_jit_step

    rows = []
    # (24, 400): same 19,200 cells / ~148k composite dofs as a (48, 200)
    # wing strip but half the RCM bandwidth (B=512 vs 768) — the block
    # arrays are what bound HBM in f64
    shapes = [(16, 24)] if quick else [(16, 24), (24, 400)]
    for n_shell in shapes:
        t_build = time.perf_counter()
        step, t0, info = build_shell_jit_step(
            n_shell=n_shell, solve_mode="jit_bt", pcg_iters=4,
            factor_store_dtype="float32", split_programs=True)
        build_s = time.perf_counter() - t_build
        dt_ms = _time_step(step, (t0,), n_rep=3)
        v, g = step(t0)
        rows.append({
            "workload": "shell_compliance_step",
            "n_shell": list(n_shell),
            "n_cells": int(info["n_cells"]),
            "n_dofs": int(info["n_dofs"]),
            "solver": "jit_bt+cholesky_spd+f32_factor_store+pcg4"
                      "+factor_reuse_adjoint (2 programs)",
            "step_ms": round(dt_ms, 2),
            "analyze_build_s": round(build_s, 2),
            "compliance": float(v),
            "grad_norm": float(np.linalg.norm(np.asarray(g))),
            "platform": jax.devices()[0].platform,
            "dtype": "float64",
            "accuracy_note": "compliance/gradient match same-mesh f64 CPU "
                             "oracle to 1.3e-5 / 4e-6 relative at (24,400)",
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_motor(quick: bool):
    import jax

    from femo_tpu.config import set_precision

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        set_precision("float32")

    from femo_tpu.models.motor.model import build_motor_jit_step

    rows = []
    refines = [0.5] if quick else [0.5, 1, 2, 4]
    for refine in refines:
        step, (dv0, iq0), d = build_motor_jit_step(
            refine=refine, em_load_steps=3, mm_newton_iters=3,
            em_newton_iters=3,
            factorization="block_thomas" if on_tpu else "lu")
        dt_ms = _time_step(step, (dv0, iq0), n_rep=5)
        rows.append({
            "workload": "motor_opt_iter",
            "refine": refine,
            "n_cells": int(d["mesh"].n_cells),
            "n_dofs": int(d["Vmm"].n_dofs + d["Vem"].n_dofs),
            "solver": "block_thomas+pcg8" if on_tpu else "dense_lu",
            "step_ms": round(dt_ms, 2),
            "platform": jax.devices()[0].platform,
            "dtype": "float32" if on_tpu else "float64",
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes only (CI smoke)")
    ap.add_argument("--skip-motor", action="store_true")
    ap.add_argument("--skip-shell", action="store_true")
    ap.add_argument("--section", choices=["shell", "motor"], default=None,
                    help="(internal) run one section in-process and print "
                         "rows as JSON lines")
    args = ap.parse_args()

    if args.section:
        {"shell": run_shell, "motor": run_motor}[args.section](args.quick)
        return

    # skipped sections keep their previous SCALE.json rows (partial
    # re-runs must not clobber the other workload's measurements)
    rows = []
    prev_path = os.path.join(REPO, "SCALE.json")
    prev = []
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
    for section, skip in (("shell", args.skip_shell),
                          ("motor", args.skip_motor)):
        workload = {"shell": "shell_compliance_step",
                    "motor": "motor_opt_iter"}[section]
        if skip:
            rows.extend(r for r in prev if r.get("workload") == workload)
            continue
        cmd = [sys.executable, os.path.abspath(__file__),
               "--section", section]
        if args.quick:
            cmd.append("--quick")
        proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                              text=True, timeout=7200)
        if proc.returncode != 0:
            # keep the previous complete rows rather than replacing them
            # with the partial output of a failed section
            print(f"section {section} failed rc={proc.returncode}; "
                  "keeping previous SCALE.json rows for this workload")
            rows.extend(r for r in prev if r.get("workload") == workload)
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))
                print(line, flush=True)

    with open(os.path.join(REPO, "SCALE.json"), "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    print(f"wrote SCALE.json ({len(rows)} rows)")


if __name__ == "__main__":
    main()
