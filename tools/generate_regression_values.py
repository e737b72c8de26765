"""Generate pinned regression constants for the integration test suite.

Run once on a trusted build (host f64 path); commits the resulting
tests/integration/regression_values.json. Mirrors the reference's pinned
10-step regression floats (ref: tests/integration/test_{cylinder,cavity,
lidcavity,pinball}.py), but on OUR generated meshes — the constants are
solver-path- and mesh-dependent (SURVEY §4).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "tests/integration/regression_values.json"


def cylinder_values(tmp=Path("/tmp/reggen_cyl")):
    from flowcontrol_tpu.mesh.generation import cylinder_mesh
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    mesh = cylinder_mesh(
        yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8, segments=80
    )
    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=10, verbose=0, mesh=mesh, path_out=tmp,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(
        u_ctrl=[0.0, 0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=10
    )
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(2))
    u_full = fs.fields.u_n + fs.fields.U0
    return {
        "n_cells": mesh.num_cells,
        "U0_max": float(np.abs(fs.fields.U0).max()),
        "U0_mean": float(np.abs(fs.fields.U0).mean()),
        "U_max": float(np.abs(u_full).max()),
        "cl0": float(fs.cl0),
        "cd0": float(fs.cd0),
        "y1": float(y[0]),
        "y2": float(y[1]),
        "y3": float(y[2]),
        "dE": float(fs.compute_perturbation_energy()),
    }


def cavity_values(tmp=Path("/tmp/reggen_cav")):
    from flowcontrol_tpu.mesh.generation import cavity_mesh
    from flowcontrol_tpu.models.cavity import CavityFlowSolver

    mesh = cavity_mesh(n_coarse=12, n_mid=25, n_fine=50)
    fs = CavityFlowSolver.make_default(
        Re=7500, num_steps=10, verbose=0, mesh=mesh, path_out=tmp,
        solver_backend="host_lu", precision="f64",
    )
    # reference recipe: Picard(10) then Newton (ref: run_cavity_example.py:70-71)
    fs.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=10, tol=1e-7)
    fs.compute_steady_state(
        u_ctrl=[0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=10
    )
    umax = float(np.abs(fs.fields.U0).max())
    assert umax < 2.0, "cavity base flow failed to converge"
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(1))
    u_full = fs.fields.u_n + fs.fields.U0
    return {
        "n_cells": mesh.num_cells,
        "U0_max": float(np.abs(fs.fields.U0).max()),
        "U_max": float(np.abs(u_full).max()),
        "y1": float(y[0]),
        "y2": float(y[1]),
        "dE": float(fs.compute_perturbation_energy()),
    }


def lidcavity_values(tmp=Path("/tmp/reggen_lid")):
    from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver

    fs = LidCavityFlowSolver.make_default(
        Re=1000, num_steps=10, verbose=0, n_mesh=32, path_out=tmp,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=5)
    fs.compute_steady_state(
        u_ctrl=[0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=15
    )
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(1))
    u_full = fs.fields.u_n + fs.fields.U0
    return {
        "U0_max": float(np.abs(fs.fields.U0).max()),
        "U_max": float(np.abs(u_full).max()),
        "y1": float(y[0]),
        "y2": float(y[1]),
        "dE": float(fs.compute_perturbation_energy()),
    }


def pinball_values(tmp=Path("/tmp/reggen_pin")):
    from flowcontrol_tpu.mesh.generation import pinball_mesh
    from flowcontrol_tpu.models.pinball import PinballFlowSolver

    mesh = pinball_mesh(n1=4.0, n2=2.0, n3=0.8, segments=60, xinf=14.0)
    fs = PinballFlowSolver.make_default(
        Re=30, num_steps=10, verbose=0, mesh=mesh, path_out=tmp,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="picard", max_iter=5)
    fs.compute_steady_state(
        u_ctrl=[0.0] * 3, method="newton", initial_guess=fs.fields.UP0, max_iter=15
    )
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(3))
    u_full = fs.fields.u_n + fs.fields.U0
    return {
        "n_cells": mesh.num_cells,
        "U0_max": float(np.abs(fs.fields.U0).max()),
        "U_max": float(np.abs(u_full).max()),
        "y1": float(y[0]),
        "dE": float(fs.compute_perturbation_energy()),
    }


def operator_values(tmp=Path("/tmp/reggen_op")):
    from flowcontrol_tpu.core.operatorgetter import OperatorGetter
    from flowcontrol_tpu.mesh.generation import cylinder_mesh
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    mesh = cylinder_mesh(
        yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8, segments=80
    )
    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=1, verbose=0, mesh=mesh, path_out=tmp,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(
        u_ctrl=[0.0, 0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=10
    )
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    return {"A_fro_cylinder": float(np.sqrt((a.data**2).sum()))}


if __name__ == "__main__":
    vals = {}
    for name, fn in [
        ("cylinder", cylinder_values),
        ("cavity", cavity_values),
        ("lidcavity", lidcavity_values),
        ("pinball", pinball_values),
        ("operator", operator_values),
    ]:
        print(f"generating {name}...", flush=True)
        try:
            vals[name] = fn()
            print(f"  {vals[name]}", flush=True)
        except Exception as e:
            print(f"  FAILED: {e!r}", flush=True)
    OUT.write_text(json.dumps(vals, indent=2))
    print(f"wrote {OUT}")
