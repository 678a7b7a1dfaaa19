"""Reissner-Mindlin shell on arbitrary 3D midsurface meshes (workload W6,
/root/reference/examples/test_shell_m3l/shell_pde.py wrapping
shell_analysis_fenicsx's CG2CG1 element; SURVEY.md §2.5 "must-replace").

Formulation: flat-facet RM with per-quadrature-point local frames derived
from the geometry Jacobian (g.J).  Fields: midsurface displacement u in
CG2(3) and rotation theta in CG1(3) — the CG2/CG1 pairing that mitigates
shear locking (same pairing as the reference element) — assembled as a
CompositeState (block residual/Jacobian).  Thickness is a DG0 design field.

Energy density (isotropic CLT, reference MaterialModel.CLT /
ElasticModel.elasticEnergy usage at shell_pde.py:246-253):
  membrane  A = E t/(1-nu^2),  bending D = E t^3/(12(1-nu^2)),
  shear 5/6 G t, drilling penalty alpha G t.
Outputs: compliance, mass, elastic energy, von Mises p-norm aggregate
(shell_pde.py:262-331).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fea import FEA, Function, FunctionSpace
from ..fea.composite import CompositeState, composite_implicit_op
from ..fea.bc import DirichletBC
from ..fea.forms import FormDef, dx, grad


def local_frame(Jg):
    """Orthonormal (t1, t2, n) from the geometry Jacobian (3, 2)."""
    a1 = Jg[:, 0]
    a2 = Jg[:, 1]
    t1 = a1 / jnp.linalg.norm(a1)
    nv = jnp.cross(a1, a2)
    n = nv / jnp.linalg.norm(nv)
    t2 = jnp.cross(n, t1)
    return t1, t2, n


def shell_energy_density(uval, ugrad, thval, thgrad, t, frame, E, nu,
                         drill=1.0e-1):
    """RM shell strain energy per unit area at one quadrature point.

    ugrad/thgrad: (3,3) tangential gradients; t: thickness; frame=(t1,t2,n).
    """
    t1, t2, n = frame
    G = E / (2 * (1 + nu))
    A = E * t / (1 - nu**2)
    D = E * t**3 / (12 * (1 - nu**2))
    ks = 5.0 / 6.0

    def d(gradf, a, b):  # b . (grad f @ a)
        return jnp.dot(b, gradf @ a)

    # membrane strains (tangential)
    e11 = d(ugrad, t1, t1)
    e22 = d(ugrad, t2, t2)
    e12 = 0.5 * (d(ugrad, t1, t2) + d(ugrad, t2, t1))
    # normal-rotation components phi_a = t_a . theta
    p1 = jnp.dot(t1, thval)
    p2 = jnp.dot(t2, thval)
    # curvatures
    k11 = d(thgrad, t1, t1)
    k22 = d(thgrad, t2, t2)
    k12 = 0.5 * (d(thgrad, t1, t2) + d(thgrad, t2, t1))
    # transverse shear gamma_a = d_a w - phi_a
    g1 = d(ugrad, t1, n) - p1
    g2 = d(ugrad, t2, n) - p2
    # drilling rotation
    dr = jnp.dot(n, thval)

    psi_m = 0.5 * A * ((1 - nu) * (e11**2 + 2 * e12**2 + e22**2)
                       + nu * (e11 + e22) ** 2)
    psi_b = 0.5 * D * ((1 - nu) * (k11**2 + 2 * k12**2 + k22**2)
                       + nu * (k11 + k22) ** 2)
    psi_s = 0.5 * ks * G * t * (g1**2 + g2**2)
    psi_d = 0.5 * drill * G * t * dr**2
    return psi_m + psi_b + psi_s + psi_d


def von_mises_surface(uval, ugrad, thval, thgrad, t, frame, E, nu):
    """von Mises stress at the shell surface z = t/2 (membrane + bending;
    ShellStressRM.vonMisesStress parity, shell_pde.py:313-331)."""
    t1, t2, n = frame

    def d(gradf, a, b):
        return jnp.dot(b, gradf @ a)

    e11 = d(ugrad, t1, t1)
    e22 = d(ugrad, t2, t2)
    e12 = 0.5 * (d(ugrad, t1, t2) + d(ugrad, t2, t1))
    k11 = d(thgrad, t1, t1)
    k22 = d(thgrad, t2, t2)
    k12 = 0.5 * (d(thgrad, t1, t2) + d(thgrad, t2, t1))
    z = t / 2
    C = E / (1 - nu**2)
    s11 = C * ((e11 + z * k11) + nu * (e22 + z * k22))
    s22 = C * ((e22 + z * k22) + nu * (e11 + z * k11))
    s12 = C * (1 - nu) * (e12 + z * k12)
    return jnp.sqrt(s11**2 - s11 * s22 + s22**2 + 3 * s12**2 + 1e-20)


class RMShellModel:
    """RM shell problem on a triangulated 3D midsurface.

    Parameters mirror the reference ShellPDE + ShellModule: mesh with 3D
    coords, material (E, nu, rho), DG0 thickness field, CG1(3) force field.
    """

    def __init__(self, mesh, E: float, nu: float, rho: float = 1.0,
                 drill: float = 1e-1, edge_load_tag: int | None = None):
        # triangle or quad midsurfaces (the reference's PAV wing shells are
        # QUAD meshes, run_pav_shell.py:84-85; CG2 on quads = Q2 biquadratic)
        assert mesh.gdim == 3 and mesh.cell_type in ("triangle", "quad")
        self.mesh = mesh
        self.E, self.nu, self.rho = E, nu, rho
        self.drill = drill
        self.Vu = FunctionSpace(mesh, ("CG", 2), ncomp=3)
        self.Vth = FunctionSpace(mesh, ("CG", 1), ncomp=3)
        self.Vt = FunctionSpace(mesh, ("DG", 0))
        self.Vf = FunctionSpace(mesh, ("CG", 1), ncomp=3)
        self.u = Function(self.Vu, "u")
        self.theta = Function(self.Vth, "theta")
        self.thickness = Function(self.Vt, "thickness")
        self.force = Function(self.Vf, "force")  # per-area traction
        # optional per-length traction on tagged boundary edges (reference
        # pattern: tagged-endpoint/edge ds loads, e.g. beam point load at
        # run_thickness_opt_cantilever_beam.py:113-131)
        self.edge_load_tag = edge_load_tag
        self.edge_force = Function(self.Vf, "edge_force")

        E_, nu_, drill_ = E, nu, drill

        def r_u(w, g):
            frame = local_frame(g.J)

            def psi(uv, ug):
                return shell_energy_density(
                    uv, ug, w.theta.val, w.theta.grad, w.thickness.val,
                    frame, E_, nu_, drill_)

            dpsi = jax.jvp(psi, (w.u.val, w.u.grad),
                           (w.v.val, w.v.grad))[1]
            return dpsi - jnp.dot(w.force.val, w.v.val)

        def r_th(w, g):
            frame = local_frame(g.J)

            def psi(tv, tg):
                return shell_energy_density(
                    w.u.val, w.u.grad, tv, tg, w.thickness.val,
                    frame, E_, nu_, drill_)

            return jax.jvp(psi, (w.theta.val, w.theta.grad),
                           (w.v.val, w.v.grad))[1]

        coeffs = [self.u, self.theta, self.thickness, self.force]
        u_integrals = [dx(r_u, qdeg=4)]
        if edge_load_tag is not None:
            from ..fea.forms import ds

            u_integrals.append(ds(
                lambda w, g: -jnp.dot(w.edge_force.val, w.v.val),
                tag=edge_load_tag, qdeg=4))
            coeffs = coeffs + [self.edge_force]
        self.res_u = FormDef(u_integrals, coeffs=coeffs, test=self.Vu)
        self.res_th = FormDef([dx(r_th, qdeg=4)], coeffs=coeffs,
                              test=self.Vth)

        # output functionals
        def compliance(w, g):
            return jnp.dot(w.force.val, w.u.val)

        def mass(w, g):
            return rho * w.thickness.val

        def energy(w, g):
            frame = local_frame(g.J)
            return shell_energy_density(
                w.u.val, w.u.grad, w.theta.val, w.theta.grad,
                w.thickness.val, frame, E_, nu_, drill_)

        self.compliance_form = FormDef([dx(compliance, qdeg=4)],
                                       coeffs=[self.u, self.force])
        self.mass_form = FormDef([dx(mass)], coeffs=[self.thickness])
        self.energy_form = FormDef([dx(energy, qdeg=4)], coeffs=coeffs)

    def pnorm_stress_form(self, p: float = 8.0, m: float = 1.0):
        """p-norm von Mises aggregate integrand: int (svm/m)^p dx
        (shell_pde.py:295-311); aggregate = m * (value)^(1/p)."""
        E_, nu_ = self.E, self.nu

        def integrand(w, g):
            frame = local_frame(g.J)
            svm = von_mises_surface(
                w.u.val, w.u.grad, w.theta.val, w.theta.grad,
                w.thickness.val, frame, E_, nu_)
            return (svm / m) ** p

        return FormDef(
            [dx(integrand, qdeg=4)],
            coeffs=[self.u, self.theta, self.thickness, self.force])

    def von_mises_field_form(self, V_cg1):
        """1-form for projecting svm onto CG1 (field output)."""
        E_, nu_ = self.E, self.nu

        def integrand(w, g):
            frame = local_frame(g.J)
            svm = von_mises_surface(
                w.u.val, w.u.grad, w.theta.val, w.theta.grad,
                w.thickness.val, frame, E_, nu_)
            return svm * w.v

        return FormDef([dx(integrand, qdeg=4)],
                       coeffs=[self.u, self.theta, self.thickness],
                       test=V_cg1)

    def make_state(self, bcs):
        """CompositeState + implicit op over (u, theta)."""
        state = CompositeState(
            [self.u, self.theta],
            {"u": self.res_u, "theta": self.res_th}, bcs)
        return state

    def solve(self, bcs, inputs=None, linear_solver=None,
              newton_opts=None, solve_mode="jit_bt"):
        """Solve the composite (u, theta) state.

        Default is the device block-Thomas path (linear shell: one Newton
        step is exact) — no host solver in the default path (reference
        always solves through PETSc/MUMPS, utils_dolfinx.py:476-493).
        Pass solve_mode="eager" (optionally with a LinearSolver) for the
        host-Newton robustness path."""
        state = self.make_state(bcs)
        if solve_mode in ("jit_bt", "jit_dense") and linear_solver is None:
            op = composite_implicit_op(
                state, ["thickness", "force"],
                newton_opts={"jit_newton_iters": 1, **(newton_opts or {})},
                mode=solve_mode)
        else:
            from ..solvers.linear import LinearSolver

            op = composite_implicit_op(
                state, ["thickness", "force"],
                linear_solver=linear_solver or LinearSolver(method="scipy"),
                newton_opts={"maxiter": 10, **(newton_opts or {})})
        x = op(inputs or {}, state.current())
        state.push(x)
        return state, op, x


def shell_modal_analysis(shell: RMShellModel, bcs, n_modes: int = 6,
                         thickness=None, method: str = "dense",
                         lanczos_iters: int | None = None, seed: int = 0):
    """Natural frequencies/modes of the RM shell (workload W6 modal variant,
    /root/reference/examples/test_shell_m3l/run_pav_shell_modal.py).

    Generalized symmetric eigenproblem K phi = omega^2 M phi with the
    composite (u, theta) stiffness and a lumped consistent mass (translational
    rho*t; rotary rho*t^3/12), reduced to a standard symmetric eigenproblem
    via the lumped-mass square root.
    Returns (frequencies_hz (n_modes,), modes (n_dofs, n_modes)).

    method="dense": one dense `eigh` on the MXU — O(n^3) flops / O(n^2)
    memory, fine at test scale but unusable at the 148k-dof scale the
    static shell stack reaches.
    method="lanczos": shift-invert Lanczos on the RCM block-Thomas
    factorization of K (the same scalable factorization the static solve
    uses) — each iteration is one block-Thomas solve, O(n B^2) memory,
    so the modal path reaches the same scale as the static stack.  Full
    reorthogonalization; lanczos_iters defaults to max(2*n_modes+16, 40).
    """
    from ..fea.assemble import compile_form
    from ..fea.forms import FormDef, dx

    state = shell.make_state(bcs)
    x0 = jnp.zeros(state.n_dofs, config.jdtype)
    if thickness is not None:
        shell.thickness.array = jnp.asarray(thickness, config.jdtype)
    K_em = state.jacobian(x0, {})

    # lumped mass via the mass-matrix DIAGONAL (positive-definite even for
    # CG2, where row-sum lumping yields zero vertex masses), HRZ-scaled to
    # preserve the total translational/rotary mass per component
    du_ = Function(shell.Vu, "du_")
    dth_ = Function(shell.Vth, "dth_")

    def m_u(w, g):
        return shell.rho * w.thickness.val * jnp.dot(w.du_.val, w.v.val)

    def m_th(w, g):
        return (shell.rho * w.thickness.val ** 3 / 12.0
                * jnp.dot(w.dth_.val, w.v.val))

    mu_mat = compile_form(FormDef(
        [dx(m_u, qdeg=4)], coeffs=[du_, shell.thickness], test=shell.Vu))
    mth_mat = compile_form(FormDef(
        [dx(m_th, qdeg=4)], coeffs=[dth_, shell.thickness],
        test=shell.Vth))

    def hrz_diag(cf, dummy_name, ndofs):
        from ..fea.assemble import ElementMatrix, MatBlock

        blocks = cf.matrix_blocks_jit(dummy_name)(
            {dummy_name: jnp.zeros(ndofs, config.jdtype),
             "thickness": shell.thickness.array})
        M = ElementMatrix([MatBlock(*b) for b in blocks], ndofs, ndofs)
        d = M.diagonal()
        total = jnp.sum(M.matvec(jnp.ones(ndofs, config.jdtype)))
        return d * (total / jnp.sum(d))

    mu = hrz_diag(mu_mat, "du_", shell.Vu.n_dofs)
    mth = hrz_diag(mth_mat, "dth_", shell.Vth.n_dofs)
    m = jnp.concatenate([mu, mth])

    free_np = np.asarray(state.free)
    if method == "lanczos":
        return _modal_lanczos(K_em, m, free_np, n_modes,
                              lanczos_iters or max(2 * n_modes + 16, 40),
                              seed)

    # dense path: reduce to free dofs (a large-penalty embedding would
    # destroy the relative accuracy of the low eigenvalues in eigh)
    K = K_em.to_dense()
    free_idx = np.nonzero(free_np)[0]
    Kf = K[jnp.ix_(jnp.asarray(free_idx), jnp.asarray(free_idx))]
    mf = jnp.maximum(m[jnp.asarray(free_idx)], 1e-30)
    s = 1.0 / jnp.sqrt(mf)
    A = (Kf * s[:, None]) * s[None, :]
    A = 0.5 * (A + A.T)
    w2, V = jnp.linalg.eigh(A)
    w2 = jnp.maximum(w2[:n_modes], 0.0)
    freqs = jnp.sqrt(w2) / (2 * np.pi)
    modes = jnp.zeros((state.n_dofs, n_modes), config.jdtype)
    modes = modes.at[jnp.asarray(free_idx)].set(s[:, None] * V[:, :n_modes])
    return freqs, modes


def _modal_lanczos(K_em, m, free_np, n_modes, k, seed):
    """Shift-invert (shift 0) Lanczos for the lowest shell modes.

    Standard form A = M^{-1/2} K M^{-1/2}; Lanczos runs on
    A^{-1} = M^{1/2} K^{-1} M^{1/2} whose LARGEST eigenvalues are the
    lowest omega^2 — each application is one block-Thomas solve on the
    same RCM factorization the static stack scales with (reference runs
    its modal variant through the same MUMPS machinery).  Full
    reorthogonalization (twice) against the stored basis.

    TPU shape: the iteration body is ONE fixed-shape jitted program
    (the basis lives in a preallocated (k+1, n) buffer whose unwritten
    rows are zero, so reorthogonalizing against the full buffer is
    exact), host-looped k times with an eager breakdown check — one
    compile total instead of k growing-shape traces, and no eager
    device chatter per iteration (each eager op is a remote round trip
    on a tunneled TPU).
    """
    from ..ops.block_tridiag import BlockTridiagonalMatrix

    mat = BlockTridiagonalMatrix.from_element_matrix(K_em, free=free_np)
    fac = mat.factor(spd=True)
    freej = jnp.asarray(free_np)
    sqrt_m = jnp.where(freej, jnp.sqrt(jnp.maximum(m, 1e-30)), 0.0)

    n = m.shape[0]
    k = int(min(k, int(free_np.sum())))
    rng = np.random.default_rng(seed)
    v0 = np.where(free_np, rng.standard_normal(n), 0.0)
    v0 = v0 / np.linalg.norm(v0)

    from ..ops.block_tridiag import BlockThomasFactor

    @jax.jit
    def lanczos_step(V, j, beta_prev, v_prev, Lb, Sinv, C):
        # the factor arrays arrive as ARGUMENTS: closing over them would
        # embed multi-GB constants in the program (documented remote-TPU
        # fault; CLAUDE.md round-3)
        fb = BlockThomasFactor(
            BlockTridiagonalMatrix(Lb, Lb, Lb, mat.perm, mat.n), Sinv, C)
        v = V[j]
        w = sqrt_m * fb.solve(sqrt_m * v)
        alpha = jnp.dot(v, w)
        w = w - alpha * v - beta_prev * v_prev
        for _ in range(2):  # full reorthogonalization, twice
            w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        vnext = w / jnp.maximum(beta, jnp.finfo(w.dtype).tiny)
        return V.at[j + 1].set(vnext), alpha, beta, v

    V = jnp.zeros((k + 1, n), config.jdtype).at[0].set(
        jnp.asarray(v0, config.jdtype))
    v_prev = jnp.zeros(n, config.jdtype)
    beta_prev = jnp.asarray(0.0, config.jdtype)
    Lb, Sinv, C = fac.mat.L, fac.Sinv, fac.C
    alphas, betas = [], []
    for j in range(k):
        V, alpha, beta, v_prev = lanczos_step(
            V, j, beta_prev, v_prev, Lb, Sinv, C)
        a, b = float(alpha), float(beta)
        alphas.append(a)
        if j == k - 1 or b < 1e-14 * max(abs(a), 1.0):  # breakdown/room out
            V = V[:j + 2]
            break
        betas.append(b)
        beta_prev = beta

    T = np.diag(np.asarray(alphas))
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    mu, Y = np.linalg.eigh(T)  # ascending; largest mu = lowest omega^2
    nm = min(n_modes, len(mu))
    # largest mu = lowest omega^2; descending mu IS ascending omega^2
    sel = np.argsort(mu)[::-1][:nm]
    w2 = 1.0 / np.maximum(mu[sel], 1e-300)
    freqs = jnp.asarray(np.sqrt(np.maximum(w2, 0.0)) / (2 * np.pi),
                        config.jdtype)
    Vm = V[:len(alphas)]  # (k_used, n)
    Z = Vm.T @ jnp.asarray(Y[:, sel], config.jdtype)  # standard-form vecs
    inv_sqrt_m = jnp.where(freej, 1.0 / jnp.maximum(sqrt_m, 1e-300), 0.0)
    modes = inv_sqrt_m[:, None] * Z
    return freqs, modes


def build_shell_jit_step(n_shell=(16, 24), span=4.0, chord=1.0,
                         E=7e10, nu=0.3, thickness=0.01,
                         pressure=2.0e3, solve_mode="jit_bt",
                         pcg_iters=0, factor_method="thomas",
                         adjoint="refactor", jacobi_scale=False,
                         factor_store_dtype=None, split_programs=False,
                         spd=True, factor_compute_dtype=None,
                         mixed_ns: int = 3, mixed_tol: float = 1e-7):
    """Fully-jittable shell thickness-opt iteration at arbitrary mesh scale:
    thickness -> (compliance, d compliance / d thickness).

    The reference-scale demonstrator (VERDICT r1 item 3): the reference's
    eVTOL wing is a 107,695-tri-element shell solved under MPI+MUMPS
    (/root/reference/examples/aeroelasticity_vlm/static/csdl_with_feedback/
    run_aeroelasticity_static_w_feedback.py:55).  n_shell=(24, 400) gives
    19,200 cells / ~148k composite dofs; the forward solve + IFT adjoint
    run entirely on device through the RCM block-Thomas factorization
    (solve_mode="jit_bt"; pcg_iters>0 adds fixed-count PCG polish).

    PRECISION: thin-shell composites must run in f64 — the equilibrated
    condition number (measured 6.6e7 at modest size) exceeds 1/eps_f32,
    so no f32 solver arrangement yields a meaningful solution.  On TPU
    (emulated f64, no f64 LuDecomposition) the production configuration is
    spd=True (Cholesky block inverses), split_programs=True (forward and
    adjoint as separate jitted programs sharing the factorization — one
    fused program exceeds single-chip HBM at this scale),
    factor_store_dtype="float32" and pcg_iters=4; prefer narrow-chord
    aspects (RCM bandwidth, hence block memory, scales with the chord
    dof count).  Validated vs a same-mesh f64 CPU oracle to 1.3e-5.

    All per-entity term data and the block-Thomas destination map are
    threaded through the jit as ARGUMENTS (CompiledForm.term_data /
    vector_from_data), not closures — embedded multi-MB constants overflow
    the remote TPU compiler's request limit at this scale.

    Returns (step_fn, t0, info): step_fn(thickness_arr) -> (J, dJ/dt).
    """
    from ..mesh.generators import create_rectangle_mesh
    from ..mesh.mesh import Mesh
    from ..fea.assemble import ElementMatrix, MatBlock, compile_form

    if factor_compute_dtype is not None and not (
            split_programs and solve_mode == "jit_bt"):
        raise ValueError("factor_compute_dtype is implemented on the "
                         "split_programs jit_bt path only")

    ncs, nss = n_shell
    m2 = create_rectangle_mesh(ncs, nss, 0, 0, chord, span,
                               cell_type="triangle")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=E, nu=nu)
    shell.thickness.set(thickness)

    clamp = lambda x: np.isclose(x[1], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state = shell.make_state(bcs)
    free, bv = state.free, state.bc_values
    off_th = shell.Vu.n_dofs
    n_dofs = state.n_dofs

    ucf = compile_form(shell.res_u)
    tcf = compile_form(shell.res_th)
    ccf = compile_form(shell.compliance_form)
    data = {
        "u": ucf.term_data(),
        "th": tcf.term_data(),
        "c": ccf.term_data(),
    }

    # uniform transverse pressure as the nodal traction field
    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = pressure
    data["force"] = jnp.asarray(farr, config.jdtype)

    sg = jax.lax.stop_gradient

    def _vals(x, p):
        return {"u": x[:off_th], "theta": x[off_th:],
                "thickness": p["thickness"], "force": p["force"]}

    def residual(x, p):
        vals = _vals(x, p)
        r_u = ucf.vector_from_data(vals, sg(p["__data_u__"]))
        r_t = tcf.vector_from_data(vals, sg(p["__data_th__"]))
        return jnp.concatenate([r_u, r_t])

    # block ordering contract: (form, wrt, term) nesting must match the
    # host-side proto below exactly (the template's dest map is positional)
    def jac_blocks(x, p):
        vals = _vals(x, p)
        blocks = []
        for cf, key, roff in ((ucf, "__data_u__", 0),
                              (tcf, "__data_th__", off_th)):
            datas = sg(p[key])
            for cname, coff in (("u", 0), ("theta", off_th)):
                for A, rows, cols in cf.matrix_blocks_from_data(
                        vals, cname, datas):
                    blocks.append((A, rows + roff, cols + coff))
        return blocks

    # host-side sparsity proto (pattern only; values never touch the device)
    proto_blocks = []
    for cf, roff in ((ucf, 0), (tcf, off_th)):
        for cname, coff in (("u", 0), ("theta", off_th)):
            for t in cf.terms:
                rows = np.asarray(t.gdofs0["__test__"]) + roff
                cols = np.asarray(t.gdofs0[cname]) + coff
                ne, nr = rows.shape
                nc = cols.shape[1]
                # broadcast view, not a materialized (ne, nr, nc) alloc
                proto_blocks.append(MatBlock(
                    np.broadcast_to(np.float64(1.0), (ne, nr, nc)),
                    rows, cols))
    proto = ElementMatrix(proto_blocks, n_dofs, n_dofs)

    inputs_const = {
        "force": data["force"],
        "__data_u__": data["u"],
        "__data_th__": data["th"],
    }

    if solve_mode == "jit_bt":
        from ..graph.implicit import implicit_solve_bt_jit
        from ..ops.block_tridiag import BlockTridiagTemplate

        tpl = BlockTridiagTemplate(proto, free=np.asarray(free))
        inputs_const["__bt_dest__"] = tpl.dest
        solve = implicit_solve_bt_jit(
            residual, jac_blocks, tpl, free, bv,
            newton_iters=1, pcg_iters=pcg_iters,
            factor_method=factor_method, adjoint=adjoint,
            jacobi_scale=jacobi_scale,
            factor_store_dtype=factor_store_dtype, spd=spd)
    else:  # jit_dense
        from ..graph.implicit import implicit_solve_dense_jit

        def jac_dense(x, p):
            M = jnp.zeros((n_dofs, n_dofs), config.jdtype)
            for A, rows, cols in jac_blocks(x, p):
                ne, nr, nc = A.shape
                ridx = jnp.broadcast_to(rows[:, :, None], (ne, nr, nc))
                cidx = jnp.broadcast_to(cols[:, None, :], (ne, nr, nc))
                M = M.at[ridx.reshape(-1), cidx.reshape(-1)].add(
                    A.reshape(-1))
            return M

        solve = implicit_solve_dense_jit(
            residual, jac_dense, free, bv, newton_iters=1)

    def objective(tarr, consts):
        p = dict(consts)
        p["thickness"] = tarr
        x = solve(p, jnp.zeros(n_dofs, config.jdtype))
        vals = {"u": x[:off_th], "force": p["force"]}
        return ccf.scalar_from_data(vals, sg(consts["__data_c__"]))

    consts = dict(inputs_const)
    consts["__data_c__"] = data["c"]

    if split_programs and solve_mode == "jit_bt":
        # TWO jitted programs (forward solve; hand-rolled IFT adjoint
        # taking the converged state as an input): one fused
        # value_and_grad program must hold forward + adjoint buffers
        # simultaneously and exceeds single-chip HBM at reference scale
        # in f64 — splitting halves the per-program peak.  Exact for this
        # linear problem; compliance has no explicit thickness term.
        from ..fea.bc import apply_bc, constrain_residual
        from ..ops.block_tridiag import (
            BlockThomasFactor, BlockTridiagonalMatrix, pcg_fixed)

        if not spd:
            raise ValueError("split_programs path assumes the symmetric "
                             "(SPD energy-Hessian) shell operator")
        if jacobi_scale or factor_method != "thomas" or adjoint != "refactor":
            raise ValueError(
                "split_programs builds its own forward/adjoint pair and "
                "supports only jacobi_scale=False, factor_method='thomas', "
                "adjoint='refactor' (got jacobi_scale=%r, factor_method=%r, "
                "adjoint=%r)" % (jacobi_scale, factor_method, adjoint))
        if factor_compute_dtype not in (None, "mixed"):
            # the all-f32 recursion is mathematically dead for thin RM
            # composites (equilibrated cond 6.6e7 > 1/eps_f32); only the
            # chain-in-f64 mixed block inverses apply here
            raise ValueError("shell factor_compute_dtype supports only "
                             "'mixed' (thin-shell conditioning rules out "
                             f"the f32 recursion), got "
                             f"{factor_compute_dtype!r}")
        _mixed = factor_compute_dtype == "mixed"

        def _factorize(mat):
            # "mixed": f32-seeded, f64-Newton-Schulz-refined block
            # inverses with the Schur chain in f64 on the RAW operator
            # (TPU: the f64 chol/tri emulation is 37.7 of the 41.2 ms
            # per-B=512 factor step; mixed runs it at 3.9 ms).  The f32
            # seed's diagonal scaling lives INSIDE the block inverse
            # (ops/block_tridiag._inv_block_mixed), so the factor and
            # the solve path stay bit-compatible with the exact-f64
            # path — the earlier whole-operator-equilibrated variant
            # preconditioned the coupled-FSI anchor to a wrong fixed
            # point through its scale-conjugated solve
            # (experiments/fsi_anchor_mixed_diag.py).
            if _mixed:
                return mat.factor(factor_store_dtype, spd,
                                  mixed_ns=mixed_ns, mixed_tol=mixed_tol)
            return mat.factor(factor_store_dtype, spd)

        def forward(tarr, consts):
            # inlined single linear solve, returning the factorization so
            # the adjoint program never refactors (A^T = A for the energy
            # Hessian; the blocks pass between programs device-resident)
            p = dict(consts)
            p["thickness"] = tarr
            u0 = apply_bc(jnp.zeros(n_dofs, config.jdtype), free, bv)
            Rc = constrain_residual(residual(u0, p), u0, free, bv)
            mat = tpl.matrix(jac_blocks(u0, p), dest=sg(p["__bt_dest__"]))
            fac = _factorize(mat)
            du = fac.solve(-Rc)
            if pcg_iters > 0:
                du = pcg_fixed(mat, None, -Rc, pcg_iters, x0=du,
                               M=fac.solve)
            x = apply_bc(u0 + du, free, bv)
            vals = {"u": x[:off_th], "force": p["force"]}
            J = ccf.scalar_from_data(vals, sg(consts["__data_c__"]))
            return J, x, (mat.D, mat.L, mat.U, fac.Sinv, fac.C)

        def backward(tarr, x, carry, consts):
            p = dict(consts)
            p["thickness"] = tarr
            D, L, U, Sinv, C = carry
            mat = BlockTridiagonalMatrix(D, L, U, tpl.perm_full, tpl.n)
            # mixed factors the raw operator too — plain sweeps either way
            fac = BlockThomasFactor(mat, Sinv, C)
            ubar = jax.grad(lambda xx: ccf.scalar_from_data(
                {"u": xx[:off_th], "force": p["force"]},
                sg(consts["__data_c__"])))(x)
            psi = fac.solve(ubar)
            if pcg_iters > 0:
                psi = pcg_fixed(mat, None, ubar, pcg_iters, x0=psi,
                                transpose=True, M=fac.solve)
            psi = jnp.where(free, psi, 0.0)
            _, vjp_t = jax.vjp(
                lambda tt: residual(x, {**p, "thickness": tt}), tarr)
            (tbar,) = vjp_t(-psi)
            return tbar

        fwd_jit = jax.jit(forward)
        bwd_jit = jax.jit(backward)

        def step(tarr):
            v, x, carry = fwd_jit(tarr, consts)
            return v, bwd_jit(tarr, x, carry, consts)
        # stage-level programs for roofline accounting (bench_scale):
        # fwd is called as fwd(tarr, consts) -> (v, x, carry); bwd as
        # bwd(tarr, x, carry, consts)
        programs = dict(fwd=fwd_jit, bwd=bwd_jit)
    else:
        step_inner = jax.jit(jax.value_and_grad(objective, argnums=0))

        def step(tarr):
            return step_inner(tarr, consts)
        programs = dict(step=step_inner)

    from ..utils.arrays import asdev
    t0 = asdev(np.full(shell.Vt.n_dofs, thickness, config.dtype))
    return step, t0, dict(mesh=mesh, shell=shell, state=state,
                          n_dofs=n_dofs, n_cells=mesh.n_cells,
                          programs=programs, consts=consts,
                          bt_tpl=tpl if solve_mode == "jit_bt" else None)


def build_shell_sharded_step(n_shell=(4, 6), span=2.0, chord=1.0,
                             E=7e10, nu=0.3, thickness=0.01,
                             pressure=2.0e3, device_mesh=None):
    """Cells-sharded CG2CG1 shell compliance step over a device mesh:
    thickness -> (compliance, d compliance / d thickness).

    The W6 counterpart of the sharded motor step: residual/Jacobian/
    functional assembly runs under shard_map with entities partitioned over
    the mesh's cells axis and one psum replacing the MPI assembly scatter
    (reference shells assemble under dolfinx MPI, SURVEY.md N7); the dense
    composite (u, theta) solve runs replicated, the IFT adjoint reuses its
    factorization.  Small shapes only (dense block solve) — the at-scale
    single-chip path is build_shell_jit_step.
    """
    from ..mesh.generators import create_rectangle_mesh
    from ..mesh.mesh import Mesh
    from ..fea.assemble import compile_form
    from ..graph.implicit import implicit_solve_dense_jit
    from ..parallel.sharding import (
        sharded_matrix_dense_fn, sharded_scalar_fn, sharded_vector_fn)

    ncs, nss = n_shell
    m2 = create_rectangle_mesh(ncs, nss, 0, 0, chord, span,
                               cell_type="triangle")
    coords3 = np.concatenate([m2.coords, np.zeros((m2.n_nodes, 1))], axis=1)
    mesh = Mesh(coords3, m2.cells, "triangle")
    shell = RMShellModel(mesh, E=E, nu=nu)
    shell.thickness.set(thickness)
    clamp = lambda x: np.isclose(x[1], 0.0)
    bcs = [DirichletBC(shell.Vu, 0.0, where=clamp),
           DirichletBC(shell.Vth, 0.0, where=clamp)]
    state = shell.make_state(bcs)
    free, bv = state.free, state.bc_values
    off_th = shell.Vu.n_dofs
    n_dofs = state.n_dofs

    ucf = compile_form(shell.res_u)
    tcf = compile_form(shell.res_th)
    ccf = compile_form(shell.compliance_form)

    farr = np.zeros(shell.Vf.n_dofs)
    farr[2::3] = pressure
    force = jnp.asarray(farr, config.jdtype)

    if device_mesh is None:
        rfn_u, rfn_t = ucf.vector_jit(), tcf.vector_jit()
        c_fn = ccf.scalar_jit()

        def mat_dense(cf, vals, wrt):
            return cf.matrix(vals, wrt).to_dense()

        jfn = {(cf_key, wrt): (lambda cf_, wrt_: lambda vals: mat_dense(
            {"u": ucf, "th": tcf}[cf_], vals, wrt_))(cf_key, wrt)
            for cf_key in ("u", "th") for wrt in ("u", "theta")}
    else:
        rfn_u = sharded_vector_fn(ucf, device_mesh)
        rfn_t = sharded_vector_fn(tcf, device_mesh)
        c_fn = sharded_scalar_fn(ccf, device_mesh)
        jfn = {(cf_key, wrt): sharded_matrix_dense_fn(
            {"u": ucf, "th": tcf}[cf_key], device_mesh, wrt)
            for cf_key in ("u", "th") for wrt in ("u", "theta")}

    def _vals(x, p):
        return {"u": x[:off_th], "theta": x[off_th:],
                "thickness": p["thickness"], "force": force}

    def residual(x, p):
        vals = _vals(x, p)
        return jnp.concatenate([rfn_u(vals), rfn_t(vals)])

    def jac_dense(x, p):
        vals = _vals(x, p)
        rows = []
        for cf_key in ("u", "th"):
            rows.append(jnp.concatenate(
                [jfn[(cf_key, "u")](vals), jfn[(cf_key, "theta")](vals)],
                axis=1))
        return jnp.concatenate(rows, axis=0)

    solve = implicit_solve_dense_jit(residual, jac_dense, free, bv,
                                     newton_iters=1)

    def objective(tarr):
        x = solve({"thickness": tarr}, jnp.zeros(n_dofs, config.jdtype))
        return c_fn({"u": x[:off_th], "force": force})

    step = jax.jit(jax.value_and_grad(objective))
    t0 = jnp.full(shell.Vt.n_dofs, thickness, config.jdtype)
    return step, t0, dict(mesh=mesh, shell=shell, n_dofs=n_dofs)
