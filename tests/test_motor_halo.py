"""Distributed (dof-sharded halo) motor step + distributed GMRES.

VERDICT r4 items 4 and 7: the reference runs its north-star motor with
every KSP collective over the assembly communicator
(/root/reference/femo/fea/utils_dolfinx.py:476-512) and its general KSP
is ASM+GMRES (utils_dolfinx.py:451-474).  femo_tpu's analogue is
parallel/halo_newton.py: form-generic dof-sharded Newton with
distributed CG (SPD) / restarted GMRES (nonsymmetric) inner solves.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femo_tpu.fea import (
    FunctionSpace, Function, FormDef, dx, grad, dot, assemble_matrix,
    create_unit_square_mesh, DirichletBC, bc_arrays,
)
from femo_tpu.fea.assemble import compile_form
from femo_tpu.parallel.halo_newton import (
    build_halo_newton_solver, build_motor_halo_step)
from femo_tpu.parallel.sharding import device_mesh


BETA = np.array([3.0, 1.0])  # advection velocity: genuinely nonsymmetric


@pytest.fixture(scope="module")
def advdiff():
    """Advection-diffusion residual: R(u) = (grad u, grad v) +
    (beta.grad u, v) - (1, v).  The Jacobian is nonsymmetric (the
    advection term), so its distributed solve requires GMRES."""
    mesh = create_unit_square_mesh(10)
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    form = FormDef(
        [dx(lambda w, g: dot(grad(w.u), grad(w.v))
            + dot(BETA, grad(w.u)) * w.v - 1.0 * w.v)],
        coeffs=[u], test=V)
    bc = DirichletBC(V, 0.0, where=lambda x: np.isclose(x[0], 0))
    free, bv = bc_arrays([bc], V.n_dofs)
    return form, free, bv, V


def _dense_constrained(form, free, V):
    """Dense constrained Jacobian P A P + (I - P) via matvec columns."""
    A = assemble_matrix(form, "u")
    n = V.n_dofs
    cols = []
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        ef = jnp.where(free, jnp.asarray(e), 0.0)
        y = jnp.where(free, A.matvec(ef), jnp.asarray(e))
        cols.append(np.asarray(y))
    return np.stack(cols, axis=1)


def test_halo_gmres_nonsymmetric_matches_dense(advdiff, devices8):
    """Distributed GMRES == dense solve to 1e-8 on a nonsymmetric
    operator (VERDICT r4 item 7 'done' bar), forward AND transpose."""
    form, free, bv, V = advdiff
    dm = device_mesh(8)
    cf = compile_form(form)
    solve, aux = build_halo_newton_solver(
        cf, "u", free, bv, dm, vals_of=lambda u, p: {"u": u},
        newton_iters=1, krylov="gmres", cg_rtol=1e-13)

    K = _dense_constrained(form, free, V)
    asym = np.linalg.norm(K - K.T) / np.linalg.norm(K)
    assert asym > 0.05, f"operator unexpectedly symmetric ({asym:.1e})"

    rng = np.random.default_rng(3)
    b = np.where(np.asarray(free), rng.normal(size=V.n_dofs), 0.0)
    vals = {"u": jnp.zeros(V.n_dofs)}
    x, it = aux["halo_cg"](vals, jnp.asarray(b))
    x_ref = np.linalg.solve(K, b)
    rel = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-8, f"halo GMRES vs dense: rel {rel:.3e} ({int(it)} it)"

    xt, _ = aux["halo_cg"](vals, jnp.asarray(b), transpose=True)
    xt_ref = np.linalg.solve(K.T, b)
    relt = np.linalg.norm(np.asarray(xt) - xt_ref) / np.linalg.norm(xt_ref)
    assert relt < 1e-8, f"halo GMRES^T vs dense: rel {relt:.3e}"


def test_halo_newton_advdiff_solve_matches_dense(advdiff, devices8):
    """One distributed Newton solve of the linear advection-diffusion
    residual == dense solve of K u = f."""
    form, free, bv, V = advdiff
    dm = device_mesh(8)
    cf = compile_form(form)
    solve, aux = build_halo_newton_solver(
        cf, "u", free, bv, dm, vals_of=lambda u, p: {"u": u},
        newton_iters=1, krylov="gmres", cg_rtol=1e-13)
    u = solve({}, jnp.zeros(V.n_dofs))
    # residual must vanish on free dofs
    from femo_tpu.parallel.sharding import sharded_vector_fn
    r = np.asarray(sharded_vector_fn(cf, dm)({"u": u}))
    rn = np.linalg.norm(r[np.asarray(free)])
    assert rn < 1e-9, f"distributed Newton residual {rn:.3e}"


@pytest.mark.slow
def test_motor_halo_step_matches_single_device(devices8):
    """North-star motor opt iteration with BOTH implicit solves
    distributed (mm: GMRES — the Nitsche sliding-interface Jacobian is
    ~14% nonsymmetric; EM: CG): loss/gradient match the single-device
    dense-LU step to 1e-8 at the converged state (n6 — IFT gradients are
    algorithm-independent only there; at n3 the documented
    algorithm-dependence band is ~1e-4, CLAUDE.md round-3 findings)."""
    from femo_tpu.models.motor.model import build_motor_jit_step

    step1, (dv0, iq0), _ = build_motor_jit_step(
        refine=0.5, mm_newton_iters=6, em_newton_iters=6)
    l1, (g1, gi1) = step1(dv0, iq0)

    dm = device_mesh(8)
    step8, (dv8, iq8), aux = build_motor_halo_step(
        refine=0.5, mm_newton_iters=6, em_newton_iters=6, device_mesh=dm)
    l8, (g8, gi8) = step8(dv8, iq8)

    rl = abs(float(l8) - float(l1)) / abs(float(l1))
    rg = float(np.linalg.norm(np.asarray(g8) - np.asarray(g1))
               / np.linalg.norm(np.asarray(g1)))
    ri = abs(float(gi8) - float(gi1)) / abs(float(gi1))
    assert rl < 1e-10, f"halo motor loss mismatch {rl:.3e}"
    assert rg < 1e-8, f"halo motor grad(dv) mismatch {rg:.3e}"
    assert ri < 1e-8, f"halo motor grad(iq) mismatch {ri:.3e}"
    # every device owns work in both systems
    assert (aux["mm_halo"]["n_owned"] > 0).all()
    assert (aux["em_halo"]["n_owned"] > 0).all()
