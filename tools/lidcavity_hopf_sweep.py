"""Lid-cavity leading eigenvalue vs Re — bracket the Hopf point
(ref: lidcavityflowsolver.py:3 — Re_c ~ 7700).

Uses the wall-stretched structured mesh (lidcavity_mesh(stretch=...)):
uniform grids cannot resolve the Re^-1/2 wall layers past Re~5000 and
Newton stalls on them. Run with JAX_PLATFORMS=cpu (host splu/ARPACK work).
"""
import sys, time

import jax

jax.config.update("jax_platforms", "cpu")  # host splu/ARPACK work only
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver
from flowcontrol_tpu.mesh.generation import lidcavity_mesh
from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

N_MESH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
STRETCH = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
RES = [int(r) for r in sys.argv[3:]] or [1000, 2000, 3000, 4000, 5000,
                                         6000, 6500, 7000, 7400, 7700, 8000]
mesh = lidcavity_mesh(N_MESH, stretch=STRETCH)
up0 = None
for Re in RES:
    t0 = time.time()
    fs = LidCavityFlowSolver.make_default(
        Re=Re, num_steps=1, verbose=0, mesh=mesh,
        path_out=Path("/tmp/lidhopf"),
        solver_backend="host_lu", precision="f64",
    )
    if up0 is None:
        fs.compute_steady_state(method="picard", max_iter=6, u_ctrl=[0.0])
        fs.compute_steady_state(method="newton", max_iter=30, u_ctrl=[0.0],
                                initial_guess=fs.fields.UP0)
    else:
        fs.compute_steady_state(method="newton", max_iter=30, u_ctrl=[0.0],
                                initial_guess=up0)
    up0 = fs.fields.UP0.copy()
    if Re < 6000:
        print(f"Re={Re}: continuation ({time.time()-t0:.0f}s)", flush=True)
        continue
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    e = og.get_mass_matrix()
    best = None
    for sigma in (0.0 + 0.5j, 0.0 + 1.0j, 0.0 + 2.0j, 0.0 + 3.0j):
        vals = get_mat_vp_shift_invert(a, e, n=4, sigma=sigma, return_vectors=False)
        lead = vals[np.argmax(vals.real)]
        if best is None or lead.real > best.real:
            best = lead
    print(f"Re={Re}: leading {best:.6f}  ({time.time()-t0:.0f}s)", flush=True)
