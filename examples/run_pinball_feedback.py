"""Fluidic pinball with MIMO closed-loop rotation feedback.

The genuinely MIMO workflow in the target list (BASELINE.json config #4):
three independently-rotating cylinders driven by an LQG controller fed by
three downstream V-sensors. The controller artifact is synthesized from
the stock-mesh operators by ``tools/pinball_mimo_synth.py`` (modal ROM +
LQG, all first-party); this script deploys it in closed loop and compares
the perturbation-energy decay against the open-loop run.

The reference ships a pinball controller .mat it never exercises
(ref: src/examples/pinball/data_input/Kdx8dy0p0.mat); its run scripts are
open-loop schedules (ref: run_pinball_rotation_example.py:100-112). This
closes that loop.

Usage:
    python examples/run_pinball_feedback.py [--steps 400] [--open-loop]
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.core.actuator import CYLINDER_ACTUATION_MODE
from flowcontrol_tpu.core.controller import Controller
from flowcontrol_tpu.models.pinball import PinballFlowSolver

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("pinball_feedback")

STOCK = Path("/root/reference/src/examples/pinball/data_input/mesh_middle_gmsh.xdmf")
PKG = Path(__file__).resolve().parents[1] / "flowcontrol_tpu" / "models"


def main(num_steps: int = 400, closed_loop: bool = True, RE: float = 30.0,
         backend: str = "host_lu", precision: str = "f64"):
    kw = dict(meshpath=STOCK) if STOCK.exists() else dict(
        mesh_kwargs=dict(n1=2.0, n2=1.2, n3=0.5, segments=32, xinf=14.0)
    )
    fs = PinballFlowSolver.make_default(
        Re=RE, num_steps=num_steps, save_every=0, verbose=10,
        mode_actuation=CYLINDER_ACTUATION_MODE.ROTATION,
        path_out=Path.cwd() / "data_output_pinball_feedback",
        solver_backend=backend, precision=precision,
        **kw,
    )
    base = PKG / "_baseflows" / f"pinball_re{RE:g}_n{fs.space.n_dofs}.npz"
    if base.exists():
        d = np.load(base)
        fs._assign_steady_state(d["U0"], d["P0"])
        log.info("loaded committed base flow %s", base.name)
    else:
        fs.compute_steady_state(method="picard", max_iter=15, tol=1e-7,
                                u_ctrl=[0.0] * 3)
        fs.compute_steady_state(method="newton", max_iter=10,
                                u_ctrl=[0.0] * 3,
                                initial_guess=fs.fields.UP0)
    # initialize ON the leading unstable mode when the synthesized mode
    # artifact exists (see run_cavity_feedback.py) — else a small
    # downstream div-free bump
    mode_path = PKG / "_controllers" / f"pinball_mode_re{RE:g}.npz"
    ic = None
    if mode_path.exists():
        mode = np.load(mode_path)
        fs.params_ic.amplitude = 0.0
        # amplitude keeps the closed-leg spillover transient linear (the
        # weakly-controllable unstable modes cost an upfront energy bump
        # of ~1.5e3x at Re=30 / ~5e4x at Re=100 before the loop wins)
        amp = 2e-4 if RE >= 80.0 else 1e-3
        ic = amp * np.asarray(mode["v_re"], dtype=float)
        log.info("IC = %g x Re(v) of mode %s", amp, mode["eig"])
    else:
        fs.params_ic.xloc, fs.params_ic.yloc = 1.0, 0.0
        fs.params_ic.radius, fs.params_ic.amplitude = 0.6, 0.01
    fs.initialize_time_stepping(ic=ic)

    kpath = PKG / "_controllers" / f"pinball_lqg_re{RE:g}.mat"
    if closed_loop and not kpath.exists():
        raise SystemExit(
            f"{kpath} missing — run tools/pinball_mimo_synth.py first"
        )
    K = Controller.from_file(kpath) if closed_loop else None

    dt = fs.params_time.dt
    for _ in range(num_steps):
        if K is not None:
            # u = +K(y): lqg_regulator's compensator consumes the raw
            # measurement (its B_K already carries the Kalman gain sign);
            # the closed-loop spectrum certified by the synthesis tool is
            # the [[A, B·K_C], [K_B·C, K_A]] interconnection. (The
            # reference's u = Kss.step(-y) convention belongs to ITS
            # Kopt artifact, which was designed for that sign —
            # ref: run_cylinder_example.py:84-86.)
            u_ctrl = K.step(y=np.asarray(fs.y_meas), dt=dt)
        else:
            u_ctrl = np.zeros(3)
        fs.step(u_ctrl=np.asarray(u_ctrl).reshape(-1))
    fs.write_timeseries()

    ts = fs.timeseries
    dE = ts["dE"].to_numpy()
    log.info("mode=%s  dE: start %.3e  peak %.3e  end %.3e",
             "closed" if closed_loop else "open", dE[0], dE.max(), dE[-1])
    print(f"{'closed' if closed_loop else 'open'}-loop: "
          f"dE_end={dE[-1]:.4e} dE_peak={dE.max():.4e} "
          f"y_last={np.asarray(fs.y_meas).round(6)}")
    return ts


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--open-loop", action="store_true")
    ap.add_argument("--re", type=float, default=30.0,
                    help="Reynolds number (a matching controller artifact "
                         "pinball_lqg_re{RE}.mat must exist)")
    ap.add_argument("--backend", default="host_lu")
    ap.add_argument("--precision", default="f64")
    args = ap.parse_args()
    main(num_steps=args.steps, closed_loop=not args.open_loop, RE=args.re,
         backend=args.backend, precision=args.precision)
