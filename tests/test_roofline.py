"""Roofline/MFU accounting (utils/roofline.py, VERDICT r3 item 2):
classification logic and the analytic block-Thomas cost models."""

import numpy as np

from femo_tpu.utils.roofline import (
    bt_factor_cost, bt_sweep_cost, chip_spec, compiled_cost, roofline)

SPEC = dict(chip="TPU v5e", peak_flops=197e12, hbm_bw=819e9,
            hbm_bytes=16e9)


def test_roofline_classification():
    # compute-bound: time ~ flops/peak, flops-heavy
    r = roofline(1.0, 197e12, 1e9, SPEC)
    assert r["bound"] == "compute"
    assert abs(r["mfu"] - 1.0) < 1e-6
    # memory-bound: time ~ bytes/bw
    r = roofline(1.0, 1e9, 819e9, SPEC)
    assert r["bound"] == "memory"
    assert abs(r["bandwidth_util"] - 1.0) < 1e-6
    # far off both ideals with a critical path -> dependency
    r = roofline(10.0, 1e9, 1e9, SPEC, critical_steps=7000)
    assert r["bound"] == "dependency"
    assert r["critical_steps"] == 7000
    assert abs(r["per_step_us"] - 10.0 / 7000 * 1e6) < 1e-3
    # far off both ideals with no critical path -> latency
    r = roofline(10.0, 1e9, 1e9, SPEC)
    assert r["bound"] == "latency"
    # missing counts -> None
    assert roofline(1.0, None, 1e9, SPEC) is None
    assert roofline(0.0, 1e9, 1e9, SPEC) is None


def test_bt_cost_models_scale_correctly():
    f1 = bt_factor_cost(100, 128)
    f2 = bt_factor_cost(200, 128)
    assert f2["flops"] == 2 * f1["flops"]
    assert f2["critical_steps"] == 200
    # B^3 scaling of the factor
    f4 = bt_factor_cost(100, 256)
    assert abs(f4["flops"] / f1["flops"] - 8.0) < 1e-9
    # QR (general) path costs more than the SPD/Cholesky path
    assert bt_factor_cost(100, 128, spd=False)["flops"] > f1["flops"]
    s = bt_sweep_cost(100, 128, nrhs=1)
    assert s["critical_steps"] == 200  # 2 sweeps x nb
    # sweeps are B^2 (matvec), factor is B^3
    s4 = bt_sweep_cost(100, 256)
    assert abs(s4["flops"] / s["flops"] - 4.0) < 1e-9


def test_chip_spec_and_compiled_cost_on_cpu(devices8):
    # CPU: no spec -> callers skip MFU fields
    assert chip_spec() is None
    # compiled_cost returns floats (or None, None) without raising
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    fl, by = compiled_cost(fn, x)
    assert fl is None or fl > 0
