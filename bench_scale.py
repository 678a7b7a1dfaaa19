"""Scale benchmarks: reference-scale shell solve+adjoint and motor
refine-scaling rows (VERDICT r1 item 3).

Run on the bench machine:  python bench_scale.py [--quick]
Writes SCALE.json with one row per configuration:
  - CG2CG1 cantilever-wing shell thickness->compliance step (assembly +
    block-Thomas solve + IFT adjoint, fully jitted on device) at ~146k
    composite dofs — the reference's eVTOL wing scale is 107,695 tri
    elements under MPI+MUMPS (run_aeroelasticity_static_w_feedback.py:55).
  - Motor opt-iteration at refine = 0.5 / 1 / 2 (VERDICT: show the
    block-Thomas path's scaling, not just the refine=1 point).
"""

import argparse
import json
import os
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes only (CI smoke)")
    ap.add_argument("--skip-motor", action="store_true")
    ap.add_argument("--skip-shell", action="store_true")
    args = ap.parse_args()

    import jax

    from femo_tpu.config import set_precision

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        set_precision("float32")

    rows = []

    if not args.skip_shell:
        from femo_tpu.models.shell import build_shell_jit_step

        shapes = [(16, 24)] if args.quick else [(16, 24), (48, 200)]
        for n_shell in shapes:
            t_build = time.perf_counter()
            step, t0, info = build_shell_jit_step(
                n_shell=n_shell, solve_mode="jit_bt",
                pcg_iters=12 if on_tpu else 0)
            build_s = time.perf_counter() - t_build
            dt_ms = _time_step(step, (t0,), n_rep=3)
            v, g = step(t0)
            import numpy as np

            rows.append({
                "workload": "shell_compliance_step",
                "n_shell": list(n_shell),
                "n_cells": int(info["n_cells"]),
                "n_dofs": int(info["n_dofs"]),
                "solver": "jit_bt" + ("+pcg12" if on_tpu else ""),
                "step_ms": round(dt_ms, 2),
                "analyze_build_s": round(build_s, 2),
                "compliance": float(v),
                "grad_norm": float(np.linalg.norm(np.asarray(g))),
                "platform": jax.devices()[0].platform,
                "dtype": "float32" if on_tpu else "float64",
            })
            print(json.dumps(rows[-1]))

    if not args.skip_motor:
        from femo_tpu.models.motor.model import build_motor_jit_step

        refines = [0.5] if args.quick else [0.5, 1, 2]
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
            print(json.dumps(rows[-1]))

    with open(os.path.join(REPO, "SCALE.json"), "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    print(f"wrote SCALE.json ({len(rows)} rows)")


if __name__ == "__main__":
    main()
