"""Open cavity Re=7500: base flow (Picard then Newton) + unactuated run.

Mirrors ref: src/examples/cavity/run_cavity_example.py.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.models.cavity import CavityFlowSolver

logging.basicConfig(level=logging.INFO)
cwd = Path(__file__).parent


def main(num_steps=200):
    fs = CavityFlowSolver.make_default(
        Re=7500, num_steps=num_steps, save_every=50, verbose=10,
        path_out=cwd / "data_output_cavity",
        mesh_kwargs=dict(n_coarse=12, n_mid=25, n_fine=50),
    )
    # ref recipe (run_cavity_example.py:70-71)
    fs.compute_steady_state(method="picard", max_iter=10, tol=1e-7, u_ctrl=[0.0])
    fs.compute_steady_state(method="newton", max_iter=10, u_ctrl=[0.0],
                            initial_guess=fs.fields.UP0)
    fs.initialize_time_stepping(ic=None)
    for _ in range(num_steps):
        fs.step(u_ctrl=np.zeros(1))
    fs.write_timeseries()
    print(fs.timeseries.tail(3))


if __name__ == "__main__":
    main()
