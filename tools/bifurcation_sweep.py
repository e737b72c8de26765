"""Leading eigenvalue vs Re for the cylinder: bracket the Hopf point
(ref: run_cylinder_example.py:4 — Re_c ~ 46)."""
import sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

MESH_KWARGS = dict(yinf=10.0, n1=4.5, n2=2.2, n3=0.8, segments=100)
up0 = None
for Re in [40, 43, 46, 47, 49, 52]:
    t0 = time.time()
    fs = CylinderFlowSolver.make_default(
        Re=Re, num_steps=1, verbose=0, mesh_kwargs=MESH_KWARGS,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(method="picard", max_iter=3, tol=1e-7, u_ctrl=[0.0, 0.0])
    fs.compute_steady_state(method="newton", max_iter=25, u_ctrl=[0.0, 0.0],
                            initial_guess=fs.fields.UP0)
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    e = og.get_mass_matrix()
    vals = get_mat_vp_shift_invert(a, e, n=4, sigma=0.0 + 0.75j, return_vectors=False)
    lead = vals[np.argmax(vals.real)]
    print(f"Re={Re}: leading eig {lead:.6f}  ({time.time()-t0:.0f}s)", flush=True)
