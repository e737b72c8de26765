"""4 unstable eigenpairs of the cavity at Re=7500 on the stock coarse mesh
(ref: compute_eigenvalues.py:53-57): 0.889+10.899j, 0.727+13.800j,
0.461+7.881j, 0.0318+16.726j."""
import sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cavity import CavityFlowSolver
from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

MESH = "/root/reference/src/examples/cavity/data_input/cavity_coarse.xdmf"
t0 = time.time()
fs = CavityFlowSolver.make_default(
    Re=7500, meshpath=MESH, num_steps=1, save_every=0,
    path_out=Path("/tmp/stock_cavity"), verbose=0,
    solver_backend="host_lu", precision="f64",
)
fs.load_steady_state()
print(f"steady loaded {time.time()-t0:.0f}s", flush=True)
og = OperatorGetter(fs)
a = og.get_A(autodiff=False)
e = og.get_mass_matrix()
print(f"operators {time.time()-t0:.0f}s nnz={a.nnz}", flush=True)

refs = [0.889+10.899j, 0.727+13.800j, 0.461+7.881j, 0.0318+16.726j]
found = []
for sigma in (0.5+8j, 1.0+11j, 0.7+14j, 0.0+16.7j):
    t1 = time.time()
    vals = get_mat_vp_shift_invert(a, e, n=2, sigma=sigma, return_vectors=False)
    print(f"sigma={sigma}: {np.array2string(vals, precision=5)} ({time.time()-t1:.0f}s)", flush=True)
    found.extend(vals.tolist())
found = np.array(found)
for ref in refs:
    best = found[np.argmin(np.abs(found - ref))]
    print(f"ref {ref}: closest {best:.5f}  rel {abs(best-ref)/abs(ref):.2e}", flush=True)
print(f"total {time.time()-t0:.0f}s")
