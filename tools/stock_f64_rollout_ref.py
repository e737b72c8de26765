"""Host f64 ground truth for the stock_tpu_bench 50-step protocol.

Runs the exact bench trajectory (stock O1 mesh, committed base flow,
default IC, 50 zero-control steps, order-2 single-factor bench mode) on
the CPU host_lu/f64 path and prints y at step 1 and step 50 — the
reference values the TPU f32 path is judged against.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")

from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"

fs = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=50, save_every=0,
    path_out=Path("/tmp/stock_f64ref"), verbose=0,
    solver_backend="host_lu", precision="f64",
)
d = np.load(Path(__file__).resolve().parents[1] /
            "flowcontrol_tpu/models/_baseflows/cylinder_re100_n56203.npz")
fs._assign_steady_state(d["U0"], d["P0"])
fs.initialize_time_stepping(ic=None)
fs.order = 2  # match the bench's single-factorization mode
fs._prepare_systems()
fs.first_step = False

t0 = time.time()
ys = []
for i in range(50):
    ys.append(np.asarray(fs.step(np.zeros(2))))
print(f"50 steps in {time.time()-t0:.0f}s", flush=True)
print("y[0]: ", ys[0])
print("y[-1]:", ys[-1])
