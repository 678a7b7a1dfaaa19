"""Shell thickness optimization: minimize mass subject to tip-displacement
and aggregated-stress constraints (the run_pav_shell.py pattern, W6:
design vars = per-element thickness, constraints tip disp + p-norm stress,
objective mass; /root/reference/examples/test_shell_m3l/run_pav_shell.py:305-340).

python examples/run_shell_thickness_opt.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from femo_tpu.fea.assemble import compile_form
from femo_tpu.fea.bc import DirichletBC
from femo_tpu.graph.model import Model
from femo_tpu.graph.optimizer import OptimizationProblem, SLSQP
from femo_tpu.graph.simulator import Simulator
from femo_tpu.mesh.generators import create_rectangle_mesh
from femo_tpu.mesh.mesh import Mesh
from femo_tpu.models.shell import RMShellModel


def main():
    # plate wing: 4m span, 1m chord, aluminum-like
    L, b = 4.0, 1.0
    m2 = create_rectangle_mesh(4, 12, 0, 0, b, L, cell_type="triangle")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=7e10, nu=0.3, rho=2700.0)
    shell.thickness.set(0.01)
    # distributed lift-like load
    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = 400.0  # N/m^2 upward
    shell.force.array = jnp.asarray(farr)

    clamp = lambda x: np.isclose(x[1], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state = shell.make_state(bcs)
    from femo_tpu.fea.composite import composite_implicit_op
    from femo_tpu.solvers.linear import LinearSolver

    op = composite_implicit_op(state, ["thickness"],
                               linear_solver=LinearSolver(method="scipy"),
                               newton_opts={"maxiter": 4})
    mcf = compile_form(shell.mass_form)
    pform = shell.pnorm_stress_form(p=8.0, m=1e6)
    pcf = compile_form(pform)
    nv = mesh.n_nodes
    tip = int(np.argmax(mesh.coords[:, 1]))

    model = Model()

    def solve_op(t):
        x = op({"thickness": t}, jax.lax.stop_gradient(state.current()))
        parts = state.split(x)
        return parts["u"], parts["theta"]

    model.add_op("rm_shell", solve_op, ["thickness"], ["u", "theta"])
    model.add_op("mass", lambda t: mcf.scalar({"thickness": t}),
                 ["thickness"], ["mass"])
    model.add_op("tip_disp",
                 lambda u: u.reshape(-1, 3)[tip, 2],
                 ["u"], ["tip_disp"])
    model.add_op(
        "pnorm_stress",
        lambda u, th, t: 1e6 * pcf.scalar(
            {"u": u, "theta": th, "thickness": t,
             "force": shell.force.array}) ** (1 / 8.0),
        ["u", "theta", "thickness"], ["pnorm_stress"])

    model.create_input("thickness", shape=shell.Vt.n_dofs, val=0.01)
    model.add_design_variable("thickness", lower=5e-4, upper=0.05,
                              scaler=100.0)
    model.add_objective("mass", scaler=0.1)
    model.add_constraint("tip_disp", upper=0.05, scaler=20.0)
    model.add_constraint("pnorm_stress", upper=30e6, scaler=1e-7)

    sim = Simulator(model)
    out = sim.run()
    print(f"initial: mass {float(out['mass']):.2f} kg, "
          f"tip {float(out['tip_disp'])*1e3:.2f} mm, "
          f"stress {float(out['pnorm_stress'])/1e6:.2f} MPa")

    prob = OptimizationProblem(sim, "shell_thickness_opt")
    r = SLSQP(prob, ftol=1e-8, maxiter=25).solve()
    out = sim.outputs
    t = np.asarray(sim.values["thickness"])
    print("=" * 40)
    print(f"iters {r.nit} | mass {float(out['mass']):.2f} kg | "
          f"tip {float(out['tip_disp'])*1e3:.2f} mm | "
          f"stress {float(out['pnorm_stress'])/1e6:.2f} MPa")
    print(f"thickness range [{t.min()*1e3:.2f}, {t.max()*1e3:.2f}] mm "
          f"(root thicker than tip: "
          f"{t[:8].mean() > t[-8:].mean()})")


if __name__ == "__main__":
    main()
