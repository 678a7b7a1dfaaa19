"""Anchor-scale diagnosis of the mixed-precision block-Thomas factor.

The mixed factor (f32 Cholesky seed + ns f64 Newton-Schulz refinements,
f64 chain) cut the anchor factor_core 64.7 -> 1.5 s but the coupled FSI
converged to tip_disp 21.88 vs the f64 oracle's 16.56 (32% off) with
pcg4 — the GS fixed point shifts with inner-solve error, so the factor
is a much worse preconditioner at anchor conditioning than the
f32-STORED exact-f64 recursion (which gives the correct 16.56).

Hypothesis: the NS acceptance tol (1e-3) admits blocks whose inverse
error is orders worse than f32-store roundoff (6e-8); block condition
numbers grown with mesh size put many blocks near the tol boundary.

This probe measures, at the real anchor operator (nb=7246, B=128), for
a grid of (ns, tol) mixed variants plus the exact-f64 recursion:
  - per-block factor residual ||I - S_i Sinv_i||_max (S_i rebuilt from
    the stored coupling chain), computed in 2k-block chunks — the
    whole-array jit materialized several (7246,128,128) f64 temps and
    compile-OOM'd on the 16 GB chip;
  - solve quality: rel residual and rel error after direct apply and
    pcg4 / pcg16 polish.  The factor is STORED f32 exactly like the
    production path (an f64-stored factor on top of the raw+equilibrated
    f64 operators pushed the sweep program past HBM: 17.4G/15.75G), so
    the per-block residual floor is the f32-store roundoff ~6e-8 — still
    3+ orders below the regimes under test.  The whole probe runs in the
    EQUILIBRATED space (solves of S A S y = b_eq): holding the raw and
    scaled operators simultaneously runtime-OOMs the chip, and the
    preconditioner acts on the equilibrated operator anyway (production
    conjugates by the scale, identical convergence in exact arithmetic).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python \
      experiments/fsi_anchor_mixed_diag.py [--half]
Writes experiments/fsi_anchor_mixed_diag.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from femo_tpu.models.fsi import build_fsi_jit_step
from femo_tpu.ops.block_tridiag import (
    BlockThomasFactor, BlockTridiagonalMatrix, pcg_fixed)

HI = jax.lax.Precision.HIGHEST


@jax.jit
def _equil(D, L, U):
    dg = jnp.abs(jnp.diagonal(D, axis1=1, axis2=2))
    sb = jnp.where(dg > 0, 1.0 / jnp.sqrt(jnp.where(dg > 0, dg, 1.0)), 1.0)
    sm = jnp.roll(sb, 1, axis=0).at[0].set(0.0)
    sp = jnp.roll(sb, -1, axis=0).at[-1].set(0.0)
    return (D * sb[:, :, None] * sb[:, None, :],
            L * sb[:, :, None] * sm[:, None, :],
            U * sb[:, :, None] * sp[:, None, :], sb)


@jax.jit
def _block_residual_chunk(Ds_c, Ls_c, Sinv_c, Cm_c):
    """||I - S_i Sinv_i||_max per block for one chunk, with S_i =
    Ds_i - Ls_i C_{i-1} rebuilt from the stored coupling blocks (the
    recursion's own S_i).  Chunked: the whole-mesh version holds
    several (nb,128,128) f64 temps at once and exceeds HBM."""
    S = Ds_c - jnp.matmul(Ls_c, Cm_c, precision=HI)
    eye = jnp.eye(S.shape[-1], dtype=S.dtype)
    R = eye - jnp.matmul(S, Sinv_c.astype(S.dtype), precision=HI)
    return jnp.max(jnp.abs(R), axis=(1, 2))


def block_residuals(Ds, Ls, Sinv, C, chunk=1024):
    nb = Ds.shape[0]
    out = []
    for ix in np.array_split(np.arange(nb), -(-nb // chunk)):
        a, b = int(ix[0]), int(ix[-1]) + 1
        if a == 0:
            Cm_c = jnp.concatenate(
                [jnp.zeros_like(C[:1]), C[:b - 1]], axis=0)
        else:
            Cm_c = C[a - 1:b - 1]
        r = _block_residual_chunk(Ds[a:b], Ls[a:b], Sinv[a:b], Cm_c)
        out.append(np.asarray(r))
    return np.concatenate(out)


def stats(r):
    r = np.asarray(r)
    return {
        "max": float(r.max()), "median": float(np.median(r)),
        "p99": float(np.percentile(r, 99)),
        "n_gt_1e-3": int((r > 1e-3).sum()),
        "n_gt_1e-5": int((r > 1e-5).sum()),
        "n_gt_1e-7": int((r > 1e-7).sum()),
        "n_gt_1e-9": int((r > 1e-9).sum()),
        "argmax": int(r.argmax()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--half", action="store_true")
    args = ap.parse_args()
    n_shell = (4, 6720) if args.half else (4, 13440)

    fsi = build_fsi_jit_step(
        n_shell=n_shell, n_vlm=(4, 32), span=30.0, thickness=0.05,
        gs_inner=4, pcg_iters=4, factor_store_dtype="float32",
        factor_compute_dtype="mixed", accel="aitken")
    tpl, consts, t0 = fsi["tpl"], fsi["consts"], fsi["t0"]
    nb, B = tpl.nb, tpl.B
    print(f"# nb={nb} B={B}", flush=True)

    D, L, U = fsi["fill"](t0, consts)
    jax.block_until_ready(D)
    Ds, Ls, Us, sb = _equil(D, L, U)
    jax.block_until_ready(Ds)
    del D, L, U  # raw + equilibrated together runtime-OOM the chip
    mat_eq = BlockTridiagonalMatrix(Ds, Ls, Us, tpl.perm_full, tpl.n)

    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(mat_eq.n))
    b = mat_eq.matvec(x_true)
    bn = float(jnp.linalg.norm(b))

    out = {"n_shell": list(n_shell), "nb": int(nb), "B": int(B),
           "variants": []}

    def solve_quality(fac):
        q = {}
        for iters in (0, 4, 16):
            x = (fac.solve(b) if iters == 0
                 else pcg_fixed(mat_eq, None, b, iters, M=fac.solve))
            r = float(jnp.linalg.norm(b - mat_eq.matvec(x))) / bn
            e = float(jnp.linalg.norm(x - x_true)
                      / jnp.linalg.norm(x_true))
            q[f"pcg{iters}"] = {"rel_resid": r, "rel_err": e}
        return q

    variants = [("f64_exact", dict(mixed_ns=0)),
                ("ns2_tol1e-3", dict(mixed_ns=2, mixed_tol=1e-3)),
                ("ns2_tol3e-6", dict(mixed_ns=2, mixed_tol=3e-6)),
                ("ns3_tol3e-6", dict(mixed_ns=3, mixed_tol=3e-6)),
                ("ns4_tol1e-7", dict(mixed_ns=4, mixed_tol=1e-7))]
    for name, kw in variants:
        t1 = time.perf_counter()
        fc = mat_eq.factor_chunked(jnp.float32, spd=True, chunk=2048, **kw)
        jax.block_until_ready(fc.Sinv)
        t_factor = time.perf_counter() - t1
        res = block_residuals(Ds, Ls, fc.Sinv, fc.C)
        st = stats(res)
        fac = BlockThomasFactor(mat_eq, fc.Sinv, fc.C)
        q = solve_quality(fac)
        row = {"variant": name, "factor_core_s": round(t_factor, 3),
               "block_resid": st, "solve": q}
        out["variants"].append(row)
        print(json.dumps(row), flush=True)
        del fc, fac, res

    path = os.path.join(REPO, "experiments", "fsi_anchor_mixed_diag.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
