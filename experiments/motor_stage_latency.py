"""Where does the refine=1 motor step's 89 ms actually go?  (VERDICT r4
item 5: refine=1 is latency-bound at mfu 1.6e-5 — find the floor.)

The round-4 standalone stage probes (motor_bytes_breakdown.jsonl) were
polluted by the remote-tunnel dispatch latency: every warm standalone
call reads ~30 ms, which is one axon round trip, not the stage cost.
This probe times each stage inside an in-program `lax.fori_loop` with a
TRACED trip count, so one compiled program is called twice (k_small,
k_big) and the per-iteration cost is (t_big - t_small) / (k_big -
k_small): dispatch, argument transfer, and fetch all cancel.  Each loop
body is serialized through its carry (normalized chaining), so XLA
cannot batch or CSE the iterations, and outputs are reduced into the
carry so nothing is dead-code-eliminated.

Stages (f32, production shapes, EM and MM systems separately):
  residual   — one constrained residual assembly
  fill       — Jacobian element blocks -> template fill -> (D, L, U)
  factor     — one block-Thomas factor scan (length nb)
  sweeps     — one direct solve (forward+backward triangular sweeps)
  matvec     — one block-tridiagonal SpMV
  pcg8       — M(b) + 8-iteration polished PCG solve (production depth)

The attribution then reconstructs the full step from the production
counts (mm: 2x3 Newton, em: 3x3 Newton, re3 Shamanskii factors, pcg8,
refactor adjoint) and compares against the measured fused step.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/motor_stage_latency.py [--refine 1] [--block 0=auto]
Writes experiments/motor_stage_latency.jsonl (one line per stage).
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
    ap.add_argument("--block", type=int, default=0,
                    help="block size B (0 = auto: max(128, bw))")
    ap.add_argument("--out", default="motor_stage_latency.jsonl")
    args = ap.parse_args()
    refine = int(args.refine) if args.refine == int(args.refine) \
        else args.refine
    block = args.block or None

    import jax
    import jax.numpy as jnp

    from femo_tpu.config import config, set_precision

    if jax.devices()[0].platform != "cpu":
        set_precision("float32")

    from femo_tpu.fea import Function, FunctionSpace
    from femo_tpu.fea.assemble import compile_form
    from femo_tpu.fea.bc import DirichletBC, bc_arrays
    from femo_tpu.fea.forms import GlobalCoefficient
    from femo_tpu.models.motor.mesh import RADII, create_motor_mesh
    from femo_tpu.models.motor.model import build_motor_jit_step
    from femo_tpu.models.motor.pde import (
        NTAGS, em_residual_form, mesh_motion_residual_form, source_tables)
    from femo_tpu.models.motor.permeability import PiecewiseBHCurve
    from femo_tpu.ops.block_tridiag import (
        BlockTridiagonalMatrix, BlockTridiagTemplate, pcg_fixed)

    f = config.jdtype
    mesh = create_motor_mesh(refine)
    Vmm = FunctionSpace(mesh, ("CG", 1), ncomp=2)
    Vem = FunctionSpace(mesh, ("CG", 1))
    on_rim = lambda x: (
        np.isclose(np.hypot(x[0], x[1]), RADII["r0"], atol=1e-9)
        | np.isclose(np.hypot(x[0], x[1]), RADII["r6"], atol=1e-9))

    uhat = Function(Vmm, "uhat")
    uhat_bc = Function(Vmm, "uhat_bc")
    A_z = Function(Vem, "A_z")
    Ht0, Jt0 = source_tables(jnp.asarray(1e5, f), jnp.asarray(0.0, f))
    bh = PiecewiseBHCurve()
    em_cf = compile_form(em_residual_form(
        A_z, uhat, GlobalCoefficient("Htable", Ht0),
        GlobalCoefficient("Jtable", Jt0), bh))
    mm_cf = compile_form(mesh_motion_residual_form(uhat, uhat_bc))

    free_em, _ = bc_arrays([DirichletBC(Vem, 0.0, where=on_rim)],
                           Vem.n_dofs)
    free_mm, _ = bc_arrays([DirichletBC(Vmm, 0.0, where=on_rim)],
                           Vmm.n_dofs)
    tpl_em = BlockTridiagTemplate(em_cf.matrix_pattern("A_z"),
                                  free=free_em, block=block)
    tpl_mm = BlockTridiagTemplate(mm_cf.matrix_pattern("uhat"),
                                  free=free_mm, block=block)

    sys_defs = {
        "em": dict(cf=em_cf, tpl=tpl_em, n=Vem.n_dofs, wrt="A_z",
                   vals={"A_z": None, "uhat": jnp.zeros(Vmm.n_dofs, f),
                         "Htable": Ht0, "Jtable": Jt0}),
        "mm": dict(cf=mm_cf, tpl=tpl_mm, n=Vmm.n_dofs, wrt="uhat",
                   vals={"uhat": None,
                         "uhat_bc": jnp.zeros(Vmm.n_dofs, f)}),
    }

    rows = []

    def timed(fn, k, x):
        # np.asarray forces a fresh fetch (axon identical-call trap)
        outs = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(jnp.asarray(k, jnp.int32), x)
            np.asarray(jax.tree.leaves(out)[0])
            outs.append(time.perf_counter() - t0)
        return min(outs)

    def probe(name, body, x0, k_small=4, k_big=44):
        def looped(k, x):
            return jax.lax.fori_loop(0, k, body, x)

        fn = jax.jit(looped)
        fn(jnp.asarray(k_small, jnp.int32), x0)  # compile
        t_s = timed(fn, k_small, x0)
        t_b = timed(fn, k_big, x0)
        per_ms = (t_b - t_s) / (k_big - k_small) * 1e3
        rows.append(dict(stage=name, per_iter_ms=round(per_ms, 4),
                         t_small_s=round(t_s, 4), t_big_s=round(t_b, 4),
                         k=[k_small, k_big]))
        print(json.dumps(rows[-1]), flush=True)
        return per_ms

    # dispatch floor / loop overhead
    probe("noop", lambda i, x: x + 1.0, jnp.zeros(128, f),
          k_small=4, k_big=404)

    per = {}
    for sysname, sd in sys_defs.items():
        cf, tpl, n, wrt = sd["cf"], sd["tpl"], sd["n"], sd["wrt"]
        u0 = jnp.full(n, 1e-5, f)

        def vals_of(u, sd=sd, wrt=wrt):
            v = dict(sd["vals"])
            v[wrt] = u
            return v

        vec = cf.vector_jit()
        blocks_fn = cf.matrix_blocks_jit(wrt)

        def res_body(i, u, vec=vec, vals_of=vals_of, u0=u0):
            r = vec(vals_of(u))
            return u0 + r / (jnp.linalg.norm(r) + 1.0)

        per[sysname, "residual"] = probe(f"{sysname}:residual",
                                         res_body, u0)

        def fill_of(u, blocks_fn=blocks_fn, vals_of=vals_of, tpl=tpl):
            return tpl.fill([(A, r, c)
                             for A, r, c in blocks_fn(vals_of(u))])

        def fill_body(i, c, fill_of=fill_of, u0=u0):
            D, L, U = fill_of(u0 * (1.0 + 1e-12 * c))
            return 1e-12 * (D.sum() + L.sum() + U.sum())

        per[sysname, "fill"] = probe(f"{sysname}:fill", fill_body,
                                     jnp.asarray(0.0, f))

        D, L, U = jax.jit(fill_of)(u0)

        def factor_body(i, c, D=D, L=L, U=U, tpl=tpl):
            m = BlockTridiagonalMatrix(D * (1.0 + 1e-14 * c), L, U,
                                       tpl.perm_full, tpl.n)
            fac = m.factor()
            return 1e-12 * (fac.Sinv.sum() + fac.C.sum())

        per[sysname, "factor"] = probe(f"{sysname}:factor", factor_body,
                                       jnp.asarray(0.0, f),
                                       k_small=2, k_big=12)

        mat = BlockTridiagonalMatrix(D, L, U, tpl.perm_full, tpl.n)
        fac = mat.factor()
        b0 = jnp.ones(n, f)

        def sweep_body(i, b, fac=fac):
            x = fac.solve(b)
            return x / (jnp.linalg.norm(x) + 1e-30)

        per[sysname, "sweeps"] = probe(f"{sysname}:sweeps", sweep_body, b0)

        def mv_body(i, b, mat=mat):
            x = mat.matvec(b)
            return x / (jnp.linalg.norm(x) + 1e-30)

        per[sysname, "matvec"] = probe(f"{sysname}:matvec", mv_body, b0)

        def pcg_body(i, b, mat=mat, fac=fac):
            x = pcg_fixed(mat, None, b, 8, x0=fac.solve(b), M=fac.solve)
            return x / (jnp.linalg.norm(x) + 1e-30)

        per[sysname, "pcg8"] = probe(f"{sysname}:pcg8", pcg_body, b0,
                                     k_small=2, k_big=12)

    # the fused production step, same process
    step, (dv0, iq0), d = build_motor_jit_step(
        refine=refine, em_load_steps=3, mm_newton_iters=3,
        em_newton_iters=3, factorization="block_thomas",
        refactor_every=3, design_space="edge_deltas", block_size=block)
    loss, (g, gi) = step(dv0, iq0)
    np.asarray(g)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        loss, (g, gi) = step(dv0, iq0)
        np.asarray(g)
        ts.append(time.perf_counter() - t0)
    step_ms = min(ts) * 1e3

    # production counts: per Newton iter 1 residual + 1 fill + 1 pcg8
    # (x0 = M(-Rc) + 8 polished iters); factors: re3 -> one per load step
    # forward (2 mm + 3 em) + 1 transpose factor per adjoint solve;
    # adjoint: 1 fill + 1 pcg8-equivalent transpose solve per system +
    # ~1 residual-vjp per system (costed as one residual)
    def n_of(s, stage):
        return per[s, stage]

    pred = 0.0
    for s, iters, nfac in (("mm", 6, 2), ("em", 9, 3)):
        fwd = iters * (n_of(s, "residual") + n_of(s, "fill")
                       + n_of(s, "pcg8")) + nfac * n_of(s, "factor")
        adj = (n_of(s, "fill") + n_of(s, "factor") + n_of(s, "pcg8")
               + n_of(s, "residual"))
        pred += fwd + adj
    summary = dict(
        stage="attribution", refine=refine,
        B=dict(em=tpl_em.B, mm=tpl_mm.B),
        nb=dict(em=tpl_em.nb, mm=tpl_mm.nb),
        bw=dict(em=tpl_em.bw, mm=tpl_mm.bw),
        predicted_ms=round(pred, 2), measured_step_ms=round(step_ms, 2),
        loss=float(loss))
    rows.append(summary)
    print(json.dumps(summary), flush=True)

    out_path = os.path.join(REPO, "experiments", args.out)
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
