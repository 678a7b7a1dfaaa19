"""Which term of the mesh-motion form pays the 3.7 ms fill / 1.1 ms
residual? (follow-up to motor_stage_latency.jsonl: the refine=1 motor
step is mm-assembly-dominated.)

The mm residual is dx(hyperelastic interior) + dS(Nitsche sliding
interface with a jvp'd consistency term, pde.py:150-190).  This probe
times residual assembly and Jacobian fill for (a) the full form, (b) the
dx term alone, (c) the dS term alone, with the same in-program
traced-count fori_loop technique (dispatch cancels).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/motor_mm_assembly_split.py [--refine 1]
Writes experiments/motor_mm_assembly_split.jsonl.
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

    if jax.devices()[0].platform != "cpu":
        set_precision("float32")

    from femo_tpu.fea import Function, FunctionSpace
    from femo_tpu.fea.assemble import compile_form
    from femo_tpu.fea.bc import DirichletBC, bc_arrays
    from femo_tpu.fea.forms import FormDef
    from femo_tpu.models.motor.mesh import RADII, create_motor_mesh
    from femo_tpu.models.motor.pde import mesh_motion_residual_form
    from femo_tpu.ops.block_tridiag import BlockTridiagTemplate

    f = config.jdtype
    mesh = create_motor_mesh(refine)
    Vmm = FunctionSpace(mesh, ("CG", 1), ncomp=2)
    uhat = Function(Vmm, "uhat")
    uhat_bc = Function(Vmm, "uhat_bc")
    full = mesh_motion_residual_form(uhat, uhat_bc)
    on_rim = lambda x: (
        np.isclose(np.hypot(x[0], x[1]), RADII["r0"], atol=1e-9)
        | np.isclose(np.hypot(x[0], x[1]), RADII["r6"], atol=1e-9))
    free_mm, _ = bc_arrays([DirichletBC(Vmm, 0.0, where=on_rim)],
                           Vmm.n_dofs)

    variants = {
        "full": full,
        "dx_only": FormDef([i for i in full.integrals
                            if i.domain == "cell"],
                           coeffs=[uhat, uhat_bc], test=Vmm),
        "dS_only": FormDef([i for i in full.integrals
                            if i.domain == "interior_facet"],
                           coeffs=[uhat, uhat_bc], test=Vmm),
    }

    rows = []

    def timed(fn, k, x):
        outs = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(jnp.asarray(k, jnp.int32), x)
            np.asarray(jax.tree.leaves(out)[0])
            outs.append(time.perf_counter() - t0)
        return min(outs)

    def probe(name, body, x0, k_small=4, k_big=44):
        fn = jax.jit(lambda k, x: jax.lax.fori_loop(0, k, body, x))
        fn(jnp.asarray(k_small, jnp.int32), x0)
        t_s = timed(fn, k_small, x0)
        t_b = timed(fn, k_big, x0)
        per_ms = (t_b - t_s) / (k_big - k_small) * 1e3
        rows.append(dict(stage=name, per_iter_ms=round(per_ms, 4)))
        print(json.dumps(rows[-1]), flush=True)

    u0 = jnp.full(Vmm.n_dofs, 1e-5, f)
    bc0 = jnp.zeros(Vmm.n_dofs, f)
    for name, form in variants.items():
        cf = compile_form(form)
        vec = cf.vector_jit()
        blocks_fn = cf.matrix_blocks_jit("uhat")
        tpl = BlockTridiagTemplate(cf.matrix_pattern("uhat"),
                                   free=free_mm)

        def res_body(i, u, vec=vec, bc0=bc0, u0=u0):
            r = vec({"uhat": u, "uhat_bc": bc0})
            return u0 + r / (jnp.linalg.norm(r) + 1.0)

        probe(f"{name}:residual", res_body, u0)

        def fill_body(i, c, blocks_fn=blocks_fn, tpl=tpl, bc0=bc0, u0=u0):
            D, L, U = tpl.fill([(A, r, cc) for A, r, cc in blocks_fn(
                {"uhat": u0 * (1.0 + 1e-12 * c), "uhat_bc": bc0})])
            return 1e-12 * (D.sum() + L.sum() + U.sum())

        probe(f"{name}:fill", fill_body, jnp.asarray(0.0, f))

    out_path = os.path.join(REPO, "experiments",
                            "motor_mm_assembly_split.jsonl")
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
