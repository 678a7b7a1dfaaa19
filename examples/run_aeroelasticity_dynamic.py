"""Dynamic aeroelastic gust response (W8 parity,
/root/reference/examples/aeroelasticity_vlm/dynamic/).

python examples/run_aeroelasticity_dynamic.py --nsteps 20
"""

import argparse

from femo_tpu.models.fsi import DynamicShellFSI, build_wing_fsi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nsteps", type=int, default=20)
    p.add_argument("--dt", type=float, default=0.01)
    args = p.parse_args()

    fsi = build_wing_fsi(n_shell=(4, 8), n_vlm=(2, 6))
    dyn = DynamicShellFSI(fsi, dt=args.dt, fsi_iters=5)
    hist = dyn.run(args.nsteps, report=True)
    print("=" * 40)
    print("tip-displacement history:",
          [round(v, 5) for v in hist["tip_disp"]])


if __name__ == "__main__":
    main()
