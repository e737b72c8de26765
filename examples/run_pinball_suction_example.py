"""Fluidic pinball with suction (slot) actuation.

Mirrors ref: src/examples/pinball/run_pinball_suction_example.py — the
9-boundary SUCTION layout with parabolic slots, symmetric blowing schedule.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.core.actuator import CYLINDER_ACTUATION_MODE
from flowcontrol_tpu.models.pinball import PinballFlowSolver

logging.basicConfig(level=logging.INFO)
cwd = Path(__file__).parent


def main(num_steps=100):
    fs = PinballFlowSolver.make_default(
        Re=30, num_steps=num_steps, save_every=0, verbose=10,
        mode_actuation=CYLINDER_ACTUATION_MODE.SUCTION,
        path_out=cwd / "data_output_pinball_suction",
        mesh_kwargs=dict(n1=4.0, n2=2.0, n3=0.8, segments=60, xinf=14.0),
    )
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="picard", max_iter=5)
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="newton",
                            initial_guess=fs.fields.UP0)
    fs.initialize_time_stepping()
    for k in range(num_steps):
        amp = 0.5 if 20 <= k < 60 else 0.0  # blowing pulse on all slots
        fs.step(np.array([amp, amp, amp]))
    fs.write_timeseries()
    print(fs.timeseries.tail(3))


if __name__ == "__main__":
    main()
