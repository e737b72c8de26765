"""Frequency response H(jw) = C (jwE - A)^-1 B with Bode export.

Mirrors ref: src/examples/operators/compute_frequency_response.py:23-51
(50-point log sweep for the cylinder).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.io import plot_Hw, save_Hw
from flowcontrol_tpu.utils.linalg import get_frequency_response

cwd = Path(__file__).parent


def main():
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=1, verbose=0,
        mesh_kwargs=dict(yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0,
                         n3=0.8, segments=80),
        path_out=cwd / "data_output_freq",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="newton",
                            initial_guess=fs.fields.UP0)
    og = OperatorGetter(fs)
    a, e, b, c = og.get_all(autodiff=False)
    ww = np.logspace(-1, 1, 50)
    hw = get_frequency_response(a, b, c, e, ww, verbose=True)
    out = cwd / "data_output_freq"
    out.mkdir(parents=True, exist_ok=True)
    save_Hw(out / "Hw.mat", hw, ww)
    plot_Hw(out / "bode", hw, ww)
    print("peak |H|:", np.abs(hw).max())


if __name__ == "__main__":
    main()
