"""ShellModule: named-operation composition around the RM shell.

Parity with the reference's m3l layer
(/root/reference/examples/test_shell_m3l/shell_module.py: ShellModule
:14-143 and the m3l operation classes RMShell/RMShellForces/
RMShellNodalDisplacements/RMShellNodalStress :143-466): aero nodal forces at
arbitrary points map onto the shell, the shell solves, and nodal
displacements / stresses / mass / compliance are exposed as named model
variables — all as operations on the generic Model graph, differentiable
end-to-end.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fea.assemble import compile_form
from ..fea.bc import DirichletBC
from ..fea.composite import composite_implicit_op
from ..fea.project import lumped_mass, project_form
from ..fea.space import FunctionSpace
from ..graph.model import Model
from ..graph.simulator import PURE_MODE
from ..solvers.linear import LinearSolver
from .coupling import NodalMap, force_map_mass_weighted
from .shell import RMShellModel


class ShellModule(Model):
    """Model with shell operations wired by name.

    Variables:
      thickness (DG0)  [input/design]
      <prefix>nodal_forces (n_aero_pts, 3)  [input]
      -> shell traction 'force', state solve,
      <prefix>nodal_displacements (n_aero_pts, 3),
      mass, compliance, elastic_energy, pnorm_stress, von_mises (CG1)
    """

    def __init__(self, shell: RMShellModel, bcs: list[DirichletBC],
                 aero_points: np.ndarray, pnorm_p: float = 8.0,
                 pnorm_m: float = 1.0, prefix: str = "",
                 solve_mode: str = "jit_bt"):
        super().__init__()
        self.shell = shell
        mesh = shell.mesh
        state = shell.make_state(bcs)
        self.state = state
        # default: device-resident block-Thomas (RM shell is linear -> one
        # Newton step is exact); "eager" falls back to host splu Newton for
        # robustness experiments (reference always solves through MUMPS,
        # utils_dolfinx.py:476-493 — never a host-Python fallback)
        if solve_mode in ("jit_bt", "jit_dense"):
            op = composite_implicit_op(
                state, ["thickness", "force"],
                newton_opts={"jit_newton_iters": 1}, mode=solve_mode)
        else:
            op = composite_implicit_op(
                state, ["thickness", "force"],
                linear_solver=LinearSolver(method="scipy"),
                newton_opts={"maxiter": 6})
        self.op = op

        shell_pts = mesh.coords
        fmap_nm = NodalMap(shell_pts, np.asarray(aero_points))
        area = lumped_mass(shell.Vf)[0::3]
        fmap = force_map_mass_weighted(fmap_nm, area)
        dmap = NodalMap(shell_pts, np.asarray(aero_points))

        # operation: aero forces -> shell traction field
        self.add_op(f"{prefix}rm_shell_forces",
                    lambda F: fmap(F).reshape(-1),
                    [f"{prefix}nodal_forces"], ["force"])

        # operation: solve the shell
        def solve_op(tarr, farr):
            x = op({"thickness": tarr, "force": farr},
                   jax.lax.stop_gradient(state.current()))
            if not PURE_MODE.active:
                state.push(jax.lax.stop_gradient(x))
            parts = state.split(x)
            return parts["u"], parts["theta"]

        self.add_op(f"{prefix}rm_shell", solve_op,
                    ["thickness", "force"], ["u", "theta"])

        # operation: displacements at the aero points
        nv = mesh.n_nodes

        def nodal_disp(u):
            return dmap.map_displacements(u.reshape(-1, 3)[:nv])

        self.add_op(f"{prefix}rm_shell_nodal_displacements", nodal_disp,
                    ["u"], [f"{prefix}nodal_displacements"])

        # scalar outputs
        ccf = compile_form(shell.compliance_form)
        mcf = compile_form(shell.mass_form)
        ecf = compile_form(shell.energy_form)
        pform = shell.pnorm_stress_form(p=pnorm_p, m=pnorm_m)
        pcf = compile_form(pform)

        self.add_op("compliance_op",
                    lambda u, f: ccf.scalar({"u": u, "force": f}),
                    ["u", "force"], ["compliance"])
        self.add_op("mass_op", lambda t: mcf.scalar({"thickness": t}),
                    ["thickness"], ["mass"])
        self.add_op(
            "energy_op",
            lambda u, th, t, f: ecf.scalar(
                {"u": u, "theta": th, "thickness": t, "force": f}),
            ["u", "theta", "thickness", "force"], ["elastic_energy"])
        self.add_op(
            "pnorm_stress_op",
            lambda u, th, t, f: pnorm_m * pcf.scalar(
                {"u": u, "theta": th, "thickness": t,
                 "force": f}) ** (1.0 / pnorm_p),
            ["u", "theta", "thickness", "force"], ["pnorm_stress"])

        # von Mises CG1 field (RMShellNodalStress parity)
        Vcg1 = FunctionSpace(mesh, ("CG", 1))
        vmform = shell.von_mises_field_form(Vcg1)

        def vm_field(u, th, t):
            return project_form(
                vmform, Vcg1, {"u": u, "theta": th, "thickness": t})

        self.add_op("rm_shell_nodal_stress", vm_field,
                    ["u", "theta", "thickness"], ["von_mises"])

        # defaults
        self.create_input("thickness", shape=shell.Vt.n_dofs,
                          val=float(np.asarray(shell.thickness.array)[0]))
        self.create_input(f"{prefix}nodal_forces",
                          val=np.zeros((len(aero_points), 3)))


def extract_cg2_vertex_displacements(Vu_cg2, u_array, n_vertices):
    """CG2 -> CG1 nodal displacement extraction (shell_pde.py:336-434
    builds a sparse extraction map via basix tabulation; here CG2 vertex
    dofs are the leading block by construction, so extraction is a slice).

    The vertex-leading convention is asserted against the space's own
    scalar-dof coordinates: if the dofmap layout ever changes (or an
    imported space deviates), the slice would silently return garbage."""
    el = Vu_cg2.element
    assert el.family != "DG" and el.entity_dofs[0] == 1, (
        "extract_cg2_vertex_displacements requires a Lagrange space with "
        "one scalar dof per vertex")
    assert Vu_cg2.n_scalar_dofs >= n_vertices and np.array_equal(
        Vu_cg2.scalar_dof_coords[:n_vertices], Vu_cg2.mesh.coords), (
        "dof ordering is not vertex-leading; rebuild the extraction map")
    ncomp = el.ncomp
    return u_array.reshape(-1, ncomp)[:n_vertices]
