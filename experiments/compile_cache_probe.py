"""Does jax's persistent compilation cache work through the axon remote
TPU tunnel, and how much first-call time does it save on a real motor
step?  (VERDICT r4 #8: anchor first-compiles are 190-308 s per program
and re-paid by every bench process.)

Runs a motor build+first-call in TWO subprocesses with
FEMO_COMPILE_CACHE pointed at a fresh dir; the second process's
first-call time should collapse if deserialize works on this backend.
Uses the refine=0.5/n2/basis step: the refine=1 edge-delta program's
serialize stalled >30 min through the tunnel (see cache.py docstring) —
that pathology is exactly why the cache is opt-in.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/compile_cache_probe.py
Writes experiments/compile_cache_probe.json.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
from femo_tpu.config import set_precision
set_precision("float32")
from femo_tpu.utils.cache import enable_persistent_cache
d = enable_persistent_cache()
import numpy as np
from femo_tpu.models.motor.model import build_motor_jit_step
t0 = time.perf_counter()
step, (dv0, iq0), _ = build_motor_jit_step(
    refine=0.5, em_load_steps=2, mm_newton_iters=2, em_newton_iters=2,
    factorization="block_thomas", design_space="basis")
build_s = time.perf_counter() - t0
t0 = time.perf_counter()
loss, (g, gi) = step(dv0, iq0)
np.asarray(g)  # force fetch (axon timing trap)
first_s = time.perf_counter() - t0
print(json.dumps({"cache_dir": d, "build_s": round(build_s, 2),
                  "first_call_s": round(first_s, 2),
                  "loss": float(loss)}))
"""


def run_child(env):
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + ":" + e.get("PYTHONPATH", "")
    e.update(env)
    out = subprocess.run([sys.executable, "-c", CHILD], cwd=REPO, env=e,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise SystemExit(f"child failed rc={out.returncode}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    cache = tempfile.mkdtemp(prefix="femo_cache_probe_")
    try:
        cold = run_child({"FEMO_COMPILE_CACHE": cache})
        n_entries = len(os.listdir(cache))
        warm = run_child({"FEMO_COMPILE_CACHE": cache})
        off = run_child({"FEMO_COMPILE_CACHE": "0"})
        row = {
            "cold_first_call_s": cold["first_call_s"],
            "warm_first_call_s": warm["first_call_s"],
            "nocache_first_call_s": off["first_call_s"],
            "cache_entries": n_entries,
            "speedup_vs_nocache": round(
                off["first_call_s"] / max(warm["first_call_s"], 1e-9), 2),
            "loss_match": abs(cold["loss"] - warm["loss"]) <= 0.0,
            "build_s": [cold["build_s"], warm["build_s"], off["build_s"]],
        }
        print(json.dumps(row))
        with open(os.path.join(REPO, "experiments",
                               "compile_cache_probe.json"), "w") as f:
            json.dump(row, f, indent=2)
            f.write("\n")
    finally:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
