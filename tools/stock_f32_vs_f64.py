"""Stock-mesh trajectory parity: TPU schur-f32 vs host splu-f64, 10 steps."""
import os, sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"
d = np.load('/root/repo/flowcontrol_tpu/models/_baseflows/cylinder_re100_n56203.npz')

def run(backend, precision):
    fs = CylinderFlowSolver.make_default(
        Re=100, meshpath=O1, num_steps=10, save_every=0,
        path_out=Path(f"/tmp/sfv_{backend}"), verbose=0,
        solver_backend=backend, precision=precision,
        stepper_options=(
            {
                k: v
                for k, v in {
                    "factor_apply": os.environ.get("STOCK_FACTOR_APPLY"),
                    "refine_steps": (
                        int(os.environ["STOCK_REFINE"])
                        if os.environ.get("STOCK_REFINE") else None
                    ),
                }.items()
                if v is not None and v != ""
            }
            if backend == "dense_lu" else {}
        ),
    )
    fs._assign_steady_state(d["U0"], d["P0"])
    fs.initialize_time_stepping(ic=None)
    t0 = time.time()
    for _ in range(10):
        y = fs.step(np.array([0.1, -0.1]))
    print(f"{backend}/{precision}: 10 steps in {time.time()-t0:.0f}s  y={y}", flush=True)
    return np.array(y), np.asarray(fs.fields.up_, dtype=float)

y64, x64 = run("host_lu", "f64")
y32, x32 = run("dense_lu", "f32")
rel = np.linalg.norm(x32 - x64)/np.linalg.norm(x64)
print(f"field rel err {rel:.2e}; y rel err {np.abs((y32-y64)/y64).max():.2e}")
