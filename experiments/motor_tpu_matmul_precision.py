"""Does TPU's default-bf16 matmul dominate the f32 motor gradient error?

The round-4 error budget (motor_f32_error_budget.jsonl) measured
grad_rel_err ~0.04-0.12 for EVERY f32 variant on TPU — even the fully
converged one (n6, pcg16, re1) — while f64 sits at 1.9e-13.  The
block-tridiagonal solver probe then showed TPU f32 `jnp.matmul` defaults
to ONE bf16 MXU pass (2.3e-3 rel err per 128x128 product vs 7.7e-8 at
Precision.HIGHEST).  The motor step's other dots (assembly einsums,
element-matrix contractions, dense solves) still run at default
precision, so the "f32 arithmetic floor" in that budget may actually be
a bf16 floor.

This probe reruns the budget's production and converged variants with
`jax_default_matmul_precision='highest'` and compares both accuracy (vs
the same converged f64 CPU oracle) and warm step time — the roofline
says the motor step is HBM-traffic-bound (bandwidth_util 0.27, mfu
~1e-5), so the extra MXU passes should be ~free.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python \
      experiments/motor_tpu_matmul_precision.py [--refine 2]
Writes experiments/motor_tpu_matmul_precision.jsonl.
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
    """Converged f64 CPU gradient (same as motor_f32_error_budget)."""
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

    # (name, matmul_precision, newton, pcg, refactor_every)
    variants = [
        ("production default-mm (f32, n3, pcg8, re3)", None, 3, 8, 3),
        ("production highest-mm (f32, n3, pcg8, re3)", "highest", 3, 8, 3),
        ("converged  highest-mm (f32, n6, pcg16, re1)", "highest", 6, 16, 1),
    ]
    out_path = os.path.join(REPO, "experiments",
                            "motor_tpu_matmul_precision.jsonl")
    rows = []
    for name, mm, newton, pcg, re in variants:
        set_precision("float32")
        jax.config.update("jax_default_matmul_precision", mm)  # None=chip default
        step, (dv0, iq0), d = build_motor_jit_step(
            refine=refine, em_load_steps=3, mm_newton_iters=newton,
            em_newton_iters=newton, factorization="block_thomas",
            pcg_iters=pcg, refactor_every=re,
            design_space="edge_deltas")
        t0 = time.perf_counter()
        loss, (g_dv, g_iq) = step(dv0, iq0)
        np.asarray(g_dv)  # force fetch: identical-args re-call can
        first_s = time.perf_counter() - t0  # skip execution otherwise
        t0 = time.perf_counter()
        loss, (g_dv, g_iq) = step(dv0, iq0)
        np.asarray(g_dv)
        warm_s = time.perf_counter() - t0
        g = np.concatenate([np.asarray(g_dv, float), [float(g_iq)]])
        cos = float(g @ g_ref
                    / (np.linalg.norm(g) * np.linalg.norm(g_ref)))
        row = dict(
            variant=name, refine=refine, matmul_precision=mm,
            newton=newton, pcg_iters=pcg, refactor_every=re,
            loss_rel_err=abs(float(loss) - loss_ref) / abs(loss_ref),
            grad_rel_err=float(np.linalg.norm(g - g_ref)
                               / np.linalg.norm(g_ref)),
            grad_cosine=cos,
            first_call_s=round(first_s, 2), warm_step_ms=round(
                warm_s * 1e3, 2),
            platform=jax.devices()[0].platform,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    jax.config.update("jax_default_matmul_precision", None)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
