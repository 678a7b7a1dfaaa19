"""Roofline / MFU accounting for benchmark rows (VERDICT r3 item 2).

Answers, per measured stage, "how far from hardware limits is this, and
which limit?" so a slow number can be attributed to the right constraint:

* ``compute``    — measured time ~ flops / MXU peak: a faster kernel needs
                   fewer flops (algorithm change).
* ``memory``     — measured time ~ bytes / HBM bandwidth: fuse, shrink the
                   working set, or lower the storage precision.
* ``dependency`` — measured time >> both ideals AND the stage is a
                   sequential recursion (block-Thomas scans): the chip is
                   idle waiting on the critical path; only a lower-depth
                   algorithm (cyclic reduction, more parallelism) helps.
* ``latency``    — measured time >> both ideals with no stated critical
                   path: dispatch / program-overhead bound (e.g. the
                   B=128 motor step's 28 ms floor).

Flops/bytes come from XLA's own cost model when a single jitted program
exists (``compiled_cost`` — the AOT ``lower().compile()`` shares the jit
dispatch cache, so this is free after the normal warm-up call), and from
analytic models for the host-chunked block-Thomas stages where no single
program spans the stage (``bt_factor_cost`` / ``bt_sweep_cost``).

MFU is reported against the bf16 MXU peak — the single hardware ceiling.
f32 matmuls run as bf16 passes and f64 is software-emulated (an f64 flop
costs O(10) native ops), so f64 MFU understates *hardware* utilisation;
that is intentional: the number answers "how much faster could this stage
be if it were perfect bf16 MXU work", which is the re-design headroom.
"""

from __future__ import annotations

import jax

# Public per-chip peaks (cloud.google.com/tpu/docs/system-architecture):
# v5e: 197 bf16 TFLOP/s, 819 GB/s HBM, 16 GB; v4: 275 TF, 1228 GB/s, 32 GB;
# v5p: 459 TF, 2765 GB/s, 95 GB.  Keyed by device_kind substring.
CHIP_SPECS = {
    "TPU v5 lite": dict(chip="TPU v5e", peak_flops=197e12,
                        hbm_bw=819e9, hbm_bytes=16e9),
    "TPU v5e": dict(chip="TPU v5e", peak_flops=197e12,
                    hbm_bw=819e9, hbm_bytes=16e9),
    "TPU v5p": dict(chip="TPU v5p", peak_flops=459e12,
                    hbm_bw=2765e9, hbm_bytes=95e9),
    "TPU v4": dict(chip="TPU v4", peak_flops=275e12,
                   hbm_bw=1228e9, hbm_bytes=32e9),
}


def chip_spec(device=None):
    """Spec dict for the given (default: first) device, or None on CPU /
    unknown chips — callers skip MFU fields rather than invent peaks."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    if device.platform == "cpu":
        return None
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return dict(spec)
    return None


def compiled_cost(jitfn, *args):
    """(flops, bytes_accessed) from XLA's cost model for a jitted fn.

    ``jitfn.lower(*args).compile()`` shares the jit dispatch cache
    (verified on the axon backend: first normal call after AOT compile is
    ~1 ms), so calling this after the warm-up call costs nothing extra.
    Returns (None, None) when the backend exposes no cost analysis.
    """
    try:
        ca = jitfn.lower(*args).compile().cost_analysis()
    except Exception:
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not isinstance(ca, dict):
        return None, None
    return ca.get("flops"), ca.get("bytes accessed")


def bt_factor_cost(nb, B, spd=True, op_bytes=8, store_bytes=4):
    """Analytic flops/bytes for the block-Thomas factor recursion
    (ops/block_tridiag.py _factor_chunk_program), per full factorization.

    Per block (SPD/Cholesky path): S = D - L@C_prev (2B^3), chol(S)
    (B^3/3), triangular solve to L^-1 (B^3), Linv^T@Linv (2B^3),
    C = Sinv@U (2B^3)  ->  ~22/3 B^3.  QR path (f64-general): ~10 B^3.
    Bytes: read D,L,U (3 B^2 op_bytes) + write Sinv,C (2 B^2 store_bytes)
    + scan carry traffic C (2 B^2 op_bytes r/w).
    Critical path: nb sequential scan steps.
    """
    per_block = (22.0 / 3.0 if spd else 10.0) * B ** 3
    bytes_per_block = B * B * (3 * op_bytes + 2 * store_bytes + 2 * op_bytes)
    return dict(flops=nb * per_block, bytes=nb * bytes_per_block,
                critical_steps=nb)


def bt_sweep_cost(nb, B, nrhs=1, store_bytes=4, n_sweeps=2):
    """Analytic flops/bytes for the forward+backward triangular sweeps
    (one preconditioner application, nrhs right-hand sides).

    Per block per sweep: one (B,B)@(B,nrhs) gemm pair — forward reads
    L_i and Sinv_i (4 B^2 nrhs flops), backward reads C_i (2 B^2 nrhs).
    Bytes dominated by streaming the factor blocks once per sweep.
    Critical path: n_sweeps * nb sequential steps.
    """
    flops = nb * (4 + 2 * (n_sweeps - 1)) * B * B * nrhs
    bytes_ = nb * 3 * B * B * store_bytes  # Sinv + C + L streamed once
    return dict(flops=flops, bytes=bytes_, critical_steps=n_sweeps * nb)


def roofline(time_s, flops, bytes_accessed, spec=None, critical_steps=None):
    """Classify a measured stage against the chip roofline.

    Returns a JSON-ready dict (or None when no spec / no counts): mfu,
    bandwidth_util, the two ideal times, and the binding constraint.
    """
    if spec is None:
        spec = chip_spec()
    if spec is None or not time_s or flops is None or bytes_accessed is None:
        return None
    t_comp = flops / spec["peak_flops"]
    t_mem = bytes_accessed / spec["hbm_bw"]
    ideal = max(t_comp, t_mem)
    if time_s > 3.0 * ideal:
        bound = "dependency" if critical_steps else "latency"
    elif t_comp >= t_mem:
        bound = "compute"
    else:
        bound = "memory"
    out = dict(
        chip=spec["chip"],
        flops=float(flops),
        bytes=float(bytes_accessed),
        mfu=round(flops / time_s / spec["peak_flops"], 6),
        bandwidth_util=round(bytes_accessed / time_s / spec["hbm_bw"], 6),
        t_compute_ideal_s=round(t_comp, 6),
        t_memory_ideal_s=round(t_mem, 6),
        bound=bound,
    )
    if critical_steps:
        out["critical_steps"] = int(critical_steps)
        out["per_step_us"] = round(time_s / critical_steps * 1e6, 3)
    return out
