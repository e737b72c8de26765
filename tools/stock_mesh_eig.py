"""Unstable eigenvalue of the linearized NS operator on the stock O1 mesh.
Reference pins 0.132643 + 0.770015j (ref: compute_eigenvalues.py:50-51)."""
import sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"
t0 = time.time()
fs = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=1, save_every=0,
    path_out=Path("/tmp/stock_cl"), verbose=0,
    solver_backend="host_lu", precision="f64",
)
try:
    fs.load_steady_state()
    print("loaded cached steady state")
except Exception as e:
    print("recomputing steady state:", e)
    fs.compute_steady_state(method="picard", max_iter=3, tol=1e-7, u_ctrl=[0.0, 0.0])
    fs.compute_steady_state(method="newton", max_iter=25, u_ctrl=[0.0, 0.0],
                            initial_guess=fs.fields.UP0)
og = OperatorGetter(fs)
a = og.get_A(autodiff=False)
e = og.get_mass_matrix()
print(f"operators done {time.time()-t0:.0f}s, nnz(A)={a.nnz}")
vals, _ = get_mat_vp_shift_invert(a, e, n=6, sigma=0.1 + 0.75j)
print("eigs near sigma:", np.array2string(vals, precision=6))
ref = 0.132643 + 0.770015j
best = vals[np.argmin(np.abs(vals - ref))]
print(f"closest: {best:.6f}  |rel err| = {abs(best-ref)/abs(ref):.2e}")
print(f"total {time.time()-t0:.0f}s")
