"""SIMP topology optimization of a 2D cantilever (W4 parity,
/root/reference/examples/beam_topo_opt/).

python examples/run_topo_opt_cantilever_beam.py --nelx 40 --nely 20
"""

import argparse

import numpy as np

from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP
from femo_tpu.graph.simulator import Simulator
from femo_tpu.models.topopt import build_topopt_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nelx", type=int, default=40)
    p.add_argument("--nely", type=int, default=20)
    p.add_argument("--maxiter", type=int, default=60)
    p.add_argument("--method", default="SIMP", choices=["SIMP", "RAMP"])
    args = p.parse_args()

    model, fea, d = build_topopt_model(args.nelx, args.nely,
                                       method=args.method)
    fea.solve_mode = "jit_dense"
    sim = Simulator(model, jit=True)
    c0 = float(sim.run()["compliance"])
    SLSQP(OptimizationProblem(sim, "topo"), ftol=1e-9,
          maxiter=args.maxiter).solve()
    print("=" * 40)
    print(f"compliance: {c0:.4f} -> {float(sim.outputs['compliance']):.4f}")
    print(f"avg density: {float(sim.outputs['avg_density']):.4f}")


if __name__ == "__main__":
    main()
