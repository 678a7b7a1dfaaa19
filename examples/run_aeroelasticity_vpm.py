"""Dynamic aeroelasticity driven by external (VPM-style) restart loads
(W9 parity, /root/reference/examples/aeroelasticity_vpm/
run_aeroelasticity_vpm.py:15-25: the reference reads precomputed Vortex
Particle Method restart files and feeds them to the same dynamic shell
skeleton as the gust workload — the aero loads are an external input, not
an in-loop solve).

With no --restart file given, a synthetic rotor-wake-like load history is
generated and written to /tmp first (ramp-up + per-rev oscillation), so the
script is runnable out of the box:

python examples/run_aeroelasticity_vpm.py --nsteps 20
python examples/run_aeroelasticity_vpm.py --restart loads.h5 --nsteps 20
"""

import argparse

import numpy as np

from femo_tpu.models.fsi import (
    DynamicShellFSI, aero_forces_from_file, build_wing_fsi)


def write_synthetic_restart(path: str, n_pts: int, t_end: float,
                            n_samples: int = 24, seed: int = 0):
    """Synthetic VPM-like load series: smooth ramp to steady lift plus a
    per-revolution oscillation, sampled coarser than the structural dt
    (the reference's restart files are also coarse in time; loads are
    interpolated, run_aeroelasticity_vpm.py:15-25)."""
    rng = np.random.default_rng(seed)
    times = np.linspace(0.0, t_end, n_samples)
    base = rng.standard_normal((n_pts, 3)) * 0.03
    base[:, 2] += 1.0  # dominant lift
    ramp = 1.0 - np.exp(-times / max(t_end / 4, 1e-9))
    osc = 1.0 + 0.2 * np.sin(2 * np.pi * times / max(t_end / 3, 1e-9))
    series = base[None, :, :] * (40.0 * ramp * osc)[:, None, None]
    np.savez(path, time=times, forces=series)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--restart", default=None,
                   help=".h5/.npz restart file with `time` (n_t,) and "
                        "`forces` (n_t, n_pts, 3) datasets")
    p.add_argument("--nsteps", type=int, default=20)
    p.add_argument("--dt", type=float, default=0.01)
    args = p.parse_args()

    fsi = build_wing_fsi(n_shell=(4, 8), n_vlm=(2, 6))
    restart = args.restart
    if restart is None:
        n_pts = np.asarray(fsi["force_map"].W).shape[0]
        restart = write_synthetic_restart(
            "/tmp/vpm_restart.npz", n_pts, t_end=args.nsteps * args.dt)
        print(f"no --restart given; wrote synthetic loads to {restart}")

    loads = aero_forces_from_file(restart)
    dyn = DynamicShellFSI(fsi, dt=args.dt)
    hist = dyn.run(args.nsteps, report=True, aero_forces_fn=loads)
    print("=" * 40)
    print("tip-displacement history:",
          [round(v, 5) for v in hist["tip_disp"]])


if __name__ == "__main__":
    main()
