"""Static aeroelastic wing (W7 parity,
/root/reference/examples/aeroelasticity_vlm/static/).

python examples/run_aeroelasticity_static.py [--check-totals]

--check-totals verifies d(tip)/d(thickness) THROUGH the coupled
VLM <-> shell Gauss-Seidel loop against central differences and writes
the analytic / FD / error gradient fields to XDMF — reference parity with
run_aeroelasticity_static_w_feedback.py:399-428 (sim.check_totals + XDMF
dump of analytic/FD/error gradient fields).
"""

import argparse

import numpy as np

from femo_tpu.models.fsi import build_wing_fsi
from femo_tpu.utils.profiling import Timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-totals", action="store_true")
    ap.add_argument("--out", default="fsi_gradients")
    args = ap.parse_args()

    fsi = build_wing_fsi(n_shell=(6, 10), n_vlm=(3, 8))
    with Timer("Coupled FSI solve"):
        out = fsi["solve"](fsi["shell"].thickness.array)
    print("=" * 40)
    print("tip deflection:", float(out["tip_disp"]))
    print("total aero force:  ", np.asarray(out["total_aero_force"]))
    print("total mapped force:", np.asarray(out["total_mapped_force"]),
          "(conservation check, run_pav_shell.py:433-438 parity)")

    if args.check_totals:
        import jax
        import jax.numpy as jnp

        shell = fsi["shell"]
        solve = fsi["solve"]

        def tip_of_t(tarr):
            return solve(tarr, tol=1e-12, maxiter=200)["tip_disp"]

        t0 = shell.thickness.array
        with Timer("Coupled adjoint d(tip)/d(thickness)"):
            g = np.asarray(jax.grad(tip_of_t)(t0))
        h = 1e-5
        fd = np.zeros_like(g)
        with Timer(f"Central differences over {g.size} thickness dofs"):
            for i in range(g.size):
                fp = float(tip_of_t(jnp.asarray(t0).at[i].add(h)))
                fm = float(tip_of_t(jnp.asarray(t0).at[i].add(-h)))
                fd[i] = (fp - fm) / (2 * h)
        err = np.abs(g - fd)
        rel = np.linalg.norm(err) / max(np.linalg.norm(fd), 1e-30)
        print(f"check_totals[tip_disp wrt thickness]: "
              f"||analytic - FD|| / ||FD|| = {rel:.3e}")

        # dump analytic / FD / error gradient FIELDS (DG0 per-cell) to XDMF
        from femo_tpu.fea.space import Function
        from femo_tpu.io.xdmf import XDMFWriter

        with XDMFWriter(args.out + ".xdmf", fsi["mesh"]) as w:
            for name, arr in (("grad_analytic", g), ("grad_fd", fd),
                              ("grad_error", err)):
                f = Function(shell.Vt, name)
                f.array = jnp.asarray(arr)
                w.write_function(f)
        print(f"gradient fields written to {args.out}.xdmf")


if __name__ == "__main__":
    main()
