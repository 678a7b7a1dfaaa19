"""Distributed solve at the reference's FSI mesh scale (~135k cells,
SURVEY.md §6: the reference's largest mesh is a 135,957-element eVTOL wing
handled by MPI domain decomposition + parallel MUMPS).

Here: 260x260 unit-square mesh (135,200 triangles, 68k dofs), dof-sharded
over the device mesh with halo-exchange CG (parallel/halo.py).

python examples/run_distributed_poisson.py --nel 260
(uses all visible devices; on CPU set
 XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

import argparse
import time

import numpy as np
import jax

from femo_tpu.fea import (
    DirichletBC, FormDef, Function, FunctionSpace, assemble_matrix,
    bc_arrays, create_unit_square_mesh, dx, grad, dot,
)
from femo_tpu.parallel.halo import HaloShardedOperator
from femo_tpu.parallel.sharding import device_mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=260)
    args = p.parse_args()

    ndev = len(jax.devices())
    mesh = create_unit_square_mesh(args.nel)
    print(f"mesh: {mesh.n_cells} cells, devices: {ndev}")
    V = FunctionSpace(mesh, ("CG", 1))
    u = Function(V, "u")
    form = FormDef([dx(lambda w, g: dot(grad(w.u), grad(w.v)) + w.u * w.v)],
                   coeffs=[u], test=V)
    t0 = time.perf_counter()
    A = assemble_matrix(form, "u")
    print(f"assembly: {time.perf_counter() - t0:.2f}s")
    bc = DirichletBC(V, 0.0, where=lambda x: np.isclose(x[0], 0.0))
    free, _ = bc_arrays([bc], V.n_dofs)

    t0 = time.perf_counter()
    op = HaloShardedOperator(A, V.dofmap, V.n_dofs, device_mesh(ndev),
                             free=free)
    print(f"partition+layout: {time.perf_counter() - t0:.2f}s "
          f"(owned/dev ~{op.layout.L}, ghosts/dev <= {op.layout.G})")

    b = op.scatter_vector(np.ones(V.n_dofs))
    xl, iters, rn = op.cg(b, rtol=1e-8)
    jax.block_until_ready(xl)
    t0 = time.perf_counter()
    xl, iters, rn = op.cg(b, rtol=1e-8)
    jax.block_until_ready(xl)
    dt = time.perf_counter() - t0
    print(f"distributed CG: {int(iters)} iterations, ||r||={float(rn):.2e},"
          f" {dt:.2f}s ({dt / max(int(iters), 1) * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
