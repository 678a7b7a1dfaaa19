"""Static aeroelastic wing (W7 parity,
/root/reference/examples/aeroelasticity_vlm/static/).

python examples/run_aeroelasticity_static.py
"""

import numpy as np

from femo_tpu.models.fsi import build_wing_fsi
from femo_tpu.utils.profiling import Timer


def main():
    fsi = build_wing_fsi(n_shell=(6, 10), n_vlm=(3, 8))
    with Timer("Coupled FSI solve"):
        out = fsi["solve"](fsi["shell"].thickness.array)
    print("=" * 40)
    print("tip deflection:", float(out["tip_disp"]))
    print("total aero force:  ", np.asarray(out["total_aero_force"]))
    print("total mapped force:", np.asarray(out["total_mapped_force"]),
          "(conservation check, run_pav_shell.py:433-438 parity)")


if __name__ == "__main__":
    main()
