"""EM motor shape/current optimization (W5 north-star parity,
/root/reference/examples/em_motor_opt/run_motor_opt.py).

python examples/run_motor_opt.py --refine 0.5 --maxiter 10 \
    [--driver snopt] [--dash dash_motor]
"""

import argparse

import numpy as np

from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP, SNOPT
from femo_tpu.graph.simulator import Simulator
from femo_tpu.models.motor import build_motor_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--refine", type=float, default=0.5)
    p.add_argument("--maxiter", type=int, default=10)
    p.add_argument("--driver", choices=["slsqp", "snopt"], default="slsqp")
    p.add_argument("--dash", default=None,
                   help="directory for per-iteration dashboard PNG frames "
                        "(lsdo_dash parity, reference dash_pav.py)")
    args = p.parse_args()

    model, d = build_motor_model(refine=args.refine, em_load_steps=3)
    # keep within the valid (non-crushing) shape range
    model.design_variables["shape_dv"].update(lower=-1e-3, upper=1e-3)
    model.add_constraint("magnet_area", lower=7e-4, scaler=1e3)
    sim = Simulator(model)
    sim["shape_dv"] = np.array([2e-4, 0.0])
    out = sim.run()
    print("initial loss_sum:", float(out["loss_sum"]))

    prob = OptimizationProblem(sim, "motor_opt")
    dash = None
    if args.dash:
        from femo_tpu.graph.dashboard import Dashboard

        dash = Dashboard(prob, outdir=args.dash)
    if args.driver == "snopt":
        # SNOPT binding hook (reference run_motor_opt.py:373-388); falls
        # back to SLSQP when no binding is installed
        r = SNOPT(prob, Major_iterations=args.maxiter,
                  Major_optimality=1e-8).solve()
    else:
        r = SLSQP(prob, ftol=1e-8, maxiter=args.maxiter).solve()
    if dash is not None:
        print("dashboard:", dash.finalize())
    print("=" * 40)
    print("final loss_sum:", float(sim.outputs["loss_sum"]),
          "| iters:", r.nit)
    print("shape_dv:", np.asarray(sim.values["shape_dv"]),
          "iq:", float(sim.values["iq"]))
    print("areas: magnet", float(sim.outputs["magnet_area"]),
          "winding", float(sim.outputs["winding_area"]))


if __name__ == "__main__":
    main()
