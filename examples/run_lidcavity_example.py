"""Lid-driven cavity Re=8000 (supercritical Hopf near Re_c≈7700):
Picard base flow + unactuated time simulation.

Mirrors ref: src/examples/lidcavity/run_lidcavity_example.py — Picard-only
steady state close to the bifurcation, then 100 unactuated steps with the
point sensors logging. Companion workflows (continuation in Re, batched
runs, eigenvalues) live in examples/lidcavity_workflows.py.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver

logging.basicConfig(level=logging.INFO)
cwd = Path(__file__).parent


def main(num_steps=100, n_mesh=64):
    fs = LidCavityFlowSolver.make_default(
        Re=8000, num_steps=num_steps, save_every=20, verbose=10,
        path_out=cwd / "data_output_lidcavity", n_mesh=n_mesh,
    )
    # ref recipe (run_lidcavity_example.py:65): Picard only near the Hopf
    fs.compute_steady_state(method="picard", max_iter=40, tol=1e-7,
                            u_ctrl=[0.0])
    fs.initialize_time_stepping(ic=None)
    for _ in range(num_steps):
        fs.step(u_ctrl=[0.0 * fs.y_meas[0]])
    fs.write_timeseries()
    print(fs.timeseries.tail(3))


if __name__ == "__main__":
    main()
