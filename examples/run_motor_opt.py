"""EM motor shape/current optimization (W5 north-star parity,
/root/reference/examples/em_motor_opt/run_motor_opt.py).

python examples/run_motor_opt.py --refine 0.5 --maxiter 10
"""

import argparse

import numpy as np

from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP
from femo_tpu.graph.simulator import Simulator
from femo_tpu.models.motor import build_motor_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--refine", type=float, default=0.5)
    p.add_argument("--maxiter", type=int, default=10)
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
    r = SLSQP(prob, ftol=1e-8, maxiter=args.maxiter).solve()
    print("=" * 40)
    print("final loss_sum:", float(sim.outputs["loss_sum"]),
          "| iters:", r.nit)
    print("shape_dv:", np.asarray(sim.values["shape_dv"]),
          "iq:", float(sim.values["iq"]))
    print("areas: magnet", float(sim.outputs["magnet_area"]),
          "winding", float(sim.outputs["winding_area"]))


if __name__ == "__main__":
    main()
