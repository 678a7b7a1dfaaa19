"""Where do the motor step's bytes go? (roofline follow-up, r4)

BENCH_r04 roofline: the fused motor opt iteration accesses ~20.5 GB at
refine=1 (bandwidth_util 0.27, t_mem_ideal 25 ms of the measured 89 ms)
and ~328 GB at refine=4 — 16x, scaling with cells, so the traffic is in
the per-cell pipeline, not the solver scans.  This probe cost-analyzes
each stage as its own jitted program (XLA cost model, free through the
remote tunnel) to attribute the bytes:

  residual   — one EM residual assembly (vector)
  jac_fill   — one EM Jacobian element-blocks + template fill -> D/L/U
  factor     — one block-Thomas factor scan
  sweeps     — one direct solve (2 triangular sweeps)
  pcg8       — 8-iteration polished solve
  em_solve   — one full Newton body (residual + fill + factor + solve)

and compares their per-iteration multiples (15 Newton bodies, re3
factoring) against the whole step's XLA numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/motor_bytes_breakdown.py [--refine 1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refine", type=float, default=1)
    args = ap.parse_args()
    refine = int(args.refine) if args.refine == int(args.refine) \
        else args.refine

    import jax
    import jax.numpy as jnp

    from femo_tpu.config import config, set_precision
    from femo_tpu.utils.roofline import chip_spec, compiled_cost

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        set_precision("float32")

    from femo_tpu.fea.assemble import compile_form
    from femo_tpu.fea.bc import DirichletBC, bc_arrays
    from femo_tpu.models.motor.mesh import RADII, create_motor_mesh
    from femo_tpu.models.motor.model import build_motor_jit_step
    from femo_tpu.models.motor.pde import (
        em_residual_form, source_tables)
    from femo_tpu.fea import FEA, Function, FunctionSpace
    from femo_tpu.fea.forms import GlobalCoefficient
    from femo_tpu.models.motor.permeability import PiecewiseBHCurve
    from femo_tpu.ops.block_tridiag import BlockTridiagTemplate, pcg_fixed

    mesh = create_motor_mesh(refine)
    Vmm = FunctionSpace(mesh, ("CG", 1), ncomp=2)
    Vem = FunctionSpace(mesh, ("CG", 1))
    uhat = Function(Vmm, "uhat")
    A_z = Function(Vem, "A_z")
    Ht0, Jt0 = source_tables(jnp.asarray(1e5), jnp.asarray(0.0))
    Htable = GlobalCoefficient("Htable", Ht0)
    Jtable = GlobalCoefficient("Jtable", Jt0)
    bh = PiecewiseBHCurve()
    em_cf = compile_form(em_residual_form(A_z, uhat, Htable, Jtable, bh))
    on_rim = lambda x: (
        np.isclose(np.hypot(x[0], x[1]), RADII["r0"], atol=1e-9)
        | np.isclose(np.hypot(x[0], x[1]), RADII["r6"], atol=1e-9))
    free_em, _ = bc_arrays([DirichletBC(Vem, 0.0, where=on_rim)],
                           Vem.n_dofs)
    tpl = BlockTridiagTemplate(em_cf.matrix_pattern("A_z"), free=free_em)

    f = config.jdtype
    u0 = jnp.zeros(Vem.n_dofs, f)
    uh0 = jnp.zeros(Vmm.n_dofs, f)
    vals = {"A_z": u0, "uhat": uh0, "Htable": Ht0, "Jtable": Jt0}

    resid = jax.jit(lambda v: em_cf.vector(v))

    def _fill(v):
        blocks = [(b.A, b.rows, b.cols)
                  for b in em_cf.matrix(v, "A_z").blocks]
        return tpl.fill(blocks)

    fill = jax.jit(_fill)

    from femo_tpu.ops.block_tridiag import BlockTridiagonalMatrix

    def _solve(D, L, U, b):
        m = BlockTridiagonalMatrix(D, L, U, tpl.perm_full, tpl.n)
        fc = m.factor()
        return fc.solve(b)

    def _pcg(D, L, U, b):
        m = BlockTridiagonalMatrix(D, L, U, tpl.perm_full, tpl.n)
        fc = m.factor()
        return pcg_fixed(m, fc, b, 8)

    solve = jax.jit(_solve)
    pcg8 = jax.jit(_pcg)

    b0 = jnp.ones(Vem.n_dofs, f)
    D, L, U = fill(vals)

    rows = []

    def probe(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fl, by = compiled_cost(fn, *a)
        rows.append(dict(stage=name, warm_ms=round(dt * 1e3, 3),
                         flops=fl, gbytes=None if by is None
                         else round(by / 1e9, 4)))
        print(json.dumps(rows[-1]), flush=True)

    probe("residual", resid, vals)
    probe("jac_fill", fill, vals)
    probe("factor+solve(b)", solve, D, L, U, b0)
    probe("factor+pcg8(b)", pcg8, D, L, U, b0)

    # the whole production step for reference
    step, (dv0, iq0), d = build_motor_jit_step(
        refine=refine, em_load_steps=3, mm_newton_iters=3,
        em_newton_iters=3, refactor_every=3 if on_tpu else 1,
        factorization="block_thomas" if on_tpu else "lu")
    probe("full_step", step, dv0, iq0)
    spec = chip_spec()
    if spec:
        print(json.dumps({"chip": spec["chip"],
                          "hbm_gb_per_s": spec["hbm_bw"] / 1e9}))
    out_path = os.path.join(REPO, "experiments",
                            "motor_bytes_breakdown.jsonl")
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
