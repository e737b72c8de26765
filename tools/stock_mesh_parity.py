"""Compute the base flow on the reference's stock O1 cylinder mesh and
compare against the pinned regression constants
(ref: tests/integration/test_cylinder.py:66-74)."""
import sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"

t0 = time.time()
fs = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=10, save_every=5,
    path_out=Path("/tmp/stock_parity"), verbose=1,
)
print(f"setup: {time.time()-t0:.1f}s, n_dofs={fs.space.n_dofs}")
fs.compute_steady_state(method="picard", max_iter=3, tol=1e-7, u_ctrl=[0.0, 0.0])
fs.compute_steady_state(method="newton", max_iter=25, u_ctrl=[0.0, 0.0],
                        initial_guess=fs.fields.UP0)
u0 = fs.fields.U0.reshape(-1)
print(f"U0_max  = {u0.max():.16g}   ref 1.1921615450014942  rel {abs(u0.max()-1.1921615450014942)/1.1921615450014942:.2e}")
print(f"U0_mean = {u0.mean():.16g}  ref 0.336746427968607   rel {abs(u0.mean()-0.336746427968607)/0.336746427968607:.2e}")
print(f"cl0={fs.cl0:.6g} cd0={fs.cd0:.6g}")
print(f"total: {time.time()-t0:.1f}s")
