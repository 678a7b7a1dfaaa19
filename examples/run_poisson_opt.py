"""Poisson source-control optimization (W1 parity,
/root/reference/examples/poisson_opt/run_poisson_opt.py).

python examples/run_poisson_opt.py --nel 16
"""

import argparse

import numpy as np

from femo_tpu.fea import errorNorm
from femo_tpu.graph.model import FEAModel
from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP
from femo_tpu.graph.simulator import Simulator
from femo_tpu.io.xdmf import XDMFWriter
from femo_tpu.models.poisson import build_fea


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=16)
    p.add_argument("--maxiter", type=int, default=100)
    p.add_argument("--record", action="store_true")
    args = p.parse_args()

    fea, d = build_fea(nel=args.nel)
    model = FEAModel(fea=[fea])
    model.create_input("f", shape=d["W"].n_dofs, val=0.086)
    model.add_design_variable("f")
    model.add_objective("l2_functional", scaler=1e5)
    sim = Simulator(model)
    sim.run()

    prob = OptimizationProblem(sim, "poisson_opt")
    SLSQP(prob, ftol=1e-13, maxiter=args.maxiter).solve()

    print("=" * 40)
    print("Objective value:", sim["l2_functional"])
    d["f"].array = sim.values["f"]
    print("Error in controls:", errorNorm(d["f_ex"], d["f"]))
    print("Error in states:  ", errorNorm(d["u_ex"], d["u"]))
    if args.record:
        with XDMFWriter("solutions/state_u.xdmf", d["mesh"]) as x:
            x.write_function(d["u"])


if __name__ == "__main__":
    main()
