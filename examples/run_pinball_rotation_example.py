"""Fluidic pinball with rotation actuation and an open-loop schedule.

Mirrors ref: src/examples/pinball/run_pinball_rotation_example.py — a
Gaussian-bump rotation schedule applied to the three cylinders
(ref :100-112), with per-surface force coefficients logged.
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


def rotation_schedule(t, t0=0.25, sigma=0.1, amp=(1.0, -0.5, 0.5)):
    """Gaussian bump rotation rates for (mid, top, bot)."""
    g = np.exp(-0.5 * ((t - t0) / sigma) ** 2)
    return np.asarray(amp) * g


def main(num_steps=100):
    fs = PinballFlowSolver.make_default(
        Re=30, num_steps=num_steps, save_every=0, verbose=10,
        mode_actuation=CYLINDER_ACTUATION_MODE.ROTATION,
        path_out=cwd / "data_output_pinball",
        mesh_kwargs=dict(n1=4.0, n2=2.0, n3=0.8, segments=60, xinf=14.0),
    )
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="picard", max_iter=5)
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="newton",
                            initial_guess=fs.fields.UP0)
    fs.initialize_time_stepping()
    for _ in range(num_steps):
        fs.step(rotation_schedule(fs.t))
    coeffs = fs.compute_force_coefficients(
        fs.fields.u_n + fs.fields.U0, fs.fields.p_n + fs.fields.P0
    )
    for name, (cl, cd) in coeffs.items():
        print(f"{name}: Cl={cl:.4f} Cd={cd:.4f}")
    fs.write_timeseries()


if __name__ == "__main__":
    main()
