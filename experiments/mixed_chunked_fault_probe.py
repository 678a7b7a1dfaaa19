"""Isolate the anchor-scale mixed-factor TPU fault (round 5).

Two consecutive bench_scale fsi_static runs with
FSI_FACTOR_COMPUTE=mixed died at the FIRST factor call with
'UNAVAILABLE: TPU device error' at nb=7246, while the identical config
ran in round 4 (pre-d61ccac _inv_blocks_mixed refactor) and the f64
factor path runs today.  This probe skips the 25-minute FSI build: it
factors a SYNTHETIC well-conditioned SPD block-tridiagonal operator at
the anchor shape with factor_chunked in (a) exact f64 and (b) mixed
mode, then at half shape, printing one JSON line per attempt — the
fault either reproduces here (mixed-chunked recursion is the trigger)
or it does not (the trigger is in the anchor operator's values, e.g.
the residual-checked fallback cond taking the exact branch).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/mixed_chunked_fault_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from femo_tpu.ops.block_tridiag import BlockTridiagonalMatrix

    rng = np.random.default_rng(0)

    def synth(nb, B, cond_boost=1.0):
        # SPD block tridiagonal: D_i = c I + A A^T, L small coupling
        A = rng.standard_normal((nb, B, B)) * 0.1
        D = (np.einsum("nij,nkj->nik", A, A)
             + np.eye(B)[None] * (1.0 + cond_boost))
        L = rng.standard_normal((nb, B, B)) * 0.02
        L[0] = 0.0
        U = np.swapaxes(L, -1, -2)  # symmetric
        return (jnp.asarray(D), jnp.asarray(L), jnp.asarray(U))

    perm = np.arange(7246 * 128, dtype=np.int32)

    for nb in (3623, 7246):
        D, L, U = synth(nb, 128)
        pm = jnp.asarray(perm[: nb * 128])
        for mode, kw in (("exact_f64", dict()),
                         ("mixed", dict(mixed_ns=3, mixed_tol=1e-7))):
            t0 = time.perf_counter()
            try:
                m = BlockTridiagonalMatrix(D, L, U, pm, nb * 128)
                fac = m.factor_chunked("float32", spd=True, chunk=2048,
                                       **kw)
                jax.block_until_ready(fac.Sinv)
                # correctness spot check: solve a known system
                x = jnp.asarray(rng.standard_normal(nb * 128))
                r = m.matvec(fac.solve(m.matvec(x))) - m.matvec(x)
                rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(
                    m.matvec(x)))
                row = dict(nb=nb, mode=mode, ok=True,
                           wall_s=round(time.perf_counter() - t0, 2),
                           solve_rel_resid=rel)
            except Exception as exc:
                row = dict(nb=nb, mode=mode, ok=False,
                           wall_s=round(time.perf_counter() - t0, 2),
                           error=repr(exc)[:300])
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
