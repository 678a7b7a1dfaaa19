"""f32 motor-gradient error budget (VERDICT r3 item 4b).

The production TPU path (all-f32, 3 fixed Newton iters, pcg8,
refactor_every=3) carries a ~0.2% gradient deviation vs the converged f64
CPU oracle at refine=4.  This experiment decomposes that deviation into
its controllable sources by toggling one knob at a time on real TPU
hardware and comparing each variant's (loss, grad) to the same oracle:

  newton:   3 -> 6 fixed iterations (IFT gradients are exact only AT the
            converged state; truncation is the algorithm-dependent part)
  pcg:      8 -> 16 polish iterations (f32 factor-store roundoff recovery)
  re:       refactor_every 3 -> 1 (Shamanskii stale-factor effect)
  f64:      the whole step in f64 on TPU (isolates f32 arithmetic: with
            newton=6 this is the 1.4e-13-parity regime of SCALE.json)

Budget attribution: err(variant) - err(all-converged) isolates each knob;
the residual floor of the all-converged f32 variant IS the f32-arithmetic
contribution.

Usage (oracle is computed once on CPU in a subprocess, ~minutes at
refine<=2):
  PYTHONPATH=/root/repo:/root/.axon_site python \
      experiments/motor_f32_error_budget.py [--refine 2]
Writes one JSON line per variant to stdout and
experiments/motor_f32_error_budget.jsonl; does NOT touch SCALE.json.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def oracle(refine):
    """Converged f64 CPU gradient (6 Newton iters, same design space)."""
    path = f"/tmp/motor_budget_oracle_r{refine}.npz"
    if os.path.exists(path):
        return np.load(path)
    code = (
        "import os\n"
        "os.environ['PALLAS_AXON_POOL_IPS'] = ''\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "from femo_tpu.models.motor.model import build_motor_jit_step\n"
        "step, (dv0, iq0), d = build_motor_jit_step(\n"
        f"    refine={refine!r}, em_load_steps=3, mm_newton_iters=6,\n"
        "    em_newton_iters=6,\n"
        "    factorization='lu' if %r <= 1 else 'block_thomas',\n"
        "    design_space='edge_deltas')\n"
        "loss, (g_dv, g_iq) = step(dv0, iq0)\n"
        "np.savez(%r, loss=np.asarray(loss), g_dv=np.asarray(g_dv),\n"
        "         g_iq=np.asarray(g_iq))\n" % (refine, path))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=REPO, timeout=14400)
    return np.load(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refine", type=float, default=2)
    args = ap.parse_args()
    refine = int(args.refine) if args.refine == int(args.refine) \
        else args.refine

    ora = oracle(refine)
    g_ref = np.concatenate([np.asarray(ora["g_dv"]), [float(ora["g_iq"])]])
    loss_ref = float(ora["loss"])

    import jax

    from femo_tpu.config import set_precision
    from femo_tpu.models.motor.model import build_motor_jit_step

    on_tpu = jax.devices()[0].platform != "cpu"

    # (name, dtype, newton, pcg, refactor_every)
    variants = [
        ("production (f32, n3, pcg8, re3)", "float32", 3, 8, 3),
        ("re1       (f32, n3, pcg8, re1)", "float32", 3, 8, 1),
        ("pcg16     (f32, n3, pcg16, re3)", "float32", 3, 16, 3),
        ("newton6   (f32, n6, pcg8, re1)", "float32", 6, 8, 1),
        ("converged (f32, n6, pcg16, re1)", "float32", 6, 16, 1),
        ("f64       (f64, n6, pcg8, re1)", "float64", 6, 8, 1),
    ]
    out_path = os.path.join(REPO, "experiments",
                            "motor_f32_error_budget.jsonl")
    rows = []
    for name, dtype, newton, pcg, re in variants:
        set_precision(dtype)
        step, (dv0, iq0), d = build_motor_jit_step(
            refine=refine, em_load_steps=3, mm_newton_iters=newton,
            em_newton_iters=newton, factorization="block_thomas",
            pcg_iters=pcg, refactor_every=re,
            design_space="edge_deltas")
        t0 = time.perf_counter()
        loss, (g_dv, g_iq) = step(dv0, iq0)
        jax.block_until_ready(g_dv)
        dt = time.perf_counter() - t0
        g = np.concatenate([np.asarray(g_dv, float), [float(g_iq)]])
        row = dict(
            variant=name, refine=refine, dtype=dtype, newton=newton,
            pcg_iters=pcg, refactor_every=re,
            loss_rel_err=abs(float(loss) - loss_ref) / abs(loss_ref),
            grad_rel_err=float(np.linalg.norm(g - g_ref)
                               / np.linalg.norm(g_ref)),
            first_call_s=round(dt, 2),
            platform=jax.devices()[0].platform,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
