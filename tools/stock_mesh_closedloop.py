"""Full reference regression protocol on the stock O1 mesh + Kopt controller
(ref: tests/integration/test_cylinder.py:78-126): 10-step closed loop,
JSON-sidecar restart at T=0.05, 10 more steps; print all pinned metrics."""
import sys, time, shutil
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
from flowcontrol_tpu.core.controller import Controller

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"
KOPT = "/root/reference/src/examples/cylinder/data_input/Kopt_reduced13.mat"
OUT = Path("/tmp/stock_cl")

t0 = time.time()
fs = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=10, save_every=5, path_out=OUT, verbose=0,
    solver_backend="host_lu", precision="f64",
)
try:
    fs.load_steady_state()
    print("loaded cached steady state")
except Exception:
    fs.compute_steady_state(method="picard", max_iter=3, tol=1e-7, u_ctrl=[0.0, 0.0])
    fs.compute_steady_state(method="newton", max_iter=25, u_ctrl=[0.0, 0.0],
                            initial_guess=fs.fields.UP0)
print(f"base flow done {time.time()-t0:.0f}s  U0_max={fs.fields.U0.max():.16g}")
fs.initialize_time_stepping(ic=None)

Kss = Controller.from_file(file=KOPT, x0=None)
for _ in range(10):
    y_meas = fs.y_meas
    u_ctrl = Kss.step(y=-y_meas[0], dt=fs.params_time.dt)
    fs.step(u_ctrl=[u_ctrl[0], u_ctrl[0]])
fs.write_timeseries()
print(f"run1 done {time.time()-t0:.0f}s  t={fs.t}")

fs2 = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=10, save_every=5, Tstart=0.05,
    path_out=OUT, verbose=0, solver_backend="host_lu", precision="f64",
)
fs2.load_steady_state()
fs2.initialize_time_stepping(Tstart=0.05)
for _ in range(10):
    y_meas = fs2.y_meas
    u_ctrl = Kss.step(y=-y_meas[0], dt=fs2.params_time.dt)
    fs2.step(u_ctrl=np.repeat(u_ctrl, 2, axis=0))
fs2.write_timeseries()

U_full = fs2.fields.u_n + fs2.fields.U0
u_max, u_mean = U_full.max(), U_full.mean()
last = fs2.timeseries.iloc[-1]
refs = {
    "U_max": (u_max, 1.325070045534714),
    "U_mean": (u_mean, 0.3376859329866094),
    "time": (last["time"], 0.1),
    "y_meas_1": (last["y_meas_1"], 0.011615482723602308),
    "y_meas_2": (last["y_meas_2"], 0.003860524805395703),
    "y_meas_3": (last["y_meas_3"], 0.0038461597025207803),
    "dE": (last["dE"], 0.09462807324653322),
}
for k, (got, ref) in refs.items():
    print(f"{k:10s} got={got:.16g}  ref={ref:.16g}  rel={abs(got-ref)/abs(ref):.2e}")
print(f"total {time.time()-t0:.0f}s")
