"""Cavity Re=7500 on the reference's stock cavity_coarse mesh: base flow
parity + 10-step regression + the 4 unstable eigenpairs
(ref: tests/integration/test_cavity.py:47-80, compute_eigenvalues.py:53-57)."""
import sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cavity import CavityFlowSolver

MESH = "/root/reference/src/examples/cavity/data_input/cavity_coarse.xdmf"
OUT = Path("/tmp/stock_cavity")

t0 = time.time()
fs = CavityFlowSolver.make_default(
    Re=7500, meshpath=MESH, num_steps=10, save_every=5, path_out=OUT, verbose=1,
    solver_backend="host_lu", precision="f64",
)
print(f"n_dofs={fs.space.n_dofs}", flush=True)
try:
    fs.load_steady_state()
    print("loaded cached steady state", flush=True)
except Exception:
    fs.compute_steady_state(method="picard", max_iter=10, tol=1e-7, u_ctrl=[0.0])
    fs.compute_steady_state(method="newton", max_iter=10, u_ctrl=[0.0],
                            initial_guess=fs.fields.UP0)
u0 = fs.fields.U0.reshape(-1)
print(f"base flow done {time.time()-t0:.0f}s")
print(f"U0_max  = {u0.max():.16g}   ref 1.053181755992023   rel {abs(u0.max()-1.053181755992023)/1.053181755992023:.2e}", flush=True)
print(f"U0_mean = {u0.mean():.16g}  ref 0.3497226515169121  rel {abs(u0.mean()-0.3497226515169121)/0.3497226515169121:.2e}", flush=True)

# 10-step unactuated regression
fs.initialize_time_stepping(ic=None)
for _ in range(10):
    fs.step(u_ctrl=[0.0])
fs.write_timeseries()
U_full = fs.fields.u_n + fs.fields.U0
last = fs.timeseries.iloc[-1]
refs = {
    "U_max": (U_full.max(), 1.1897880864595587),
    "U_mean": (U_full.mean(), 0.3565670457803184),
    "time": (last["time"], 0.004),
    "y_meas_1": (last["y_meas_1"], 6.0488687475121505),
    "y_meas_2": (last["y_meas_2"], 0.024799707355708498),
    "dE": (last["dE"], 0.005000924582291293),
}
for k, (got, ref) in refs.items():
    print(f"{k:10s} got={got:.16g}  ref={ref:.16g}  rel={abs(got-ref)/abs(ref):.2e}", flush=True)
print(f"total {time.time()-t0:.0f}s")
