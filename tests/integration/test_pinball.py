"""Fluidic pinball integration (ref: tests/integration/test_pinball.py)."""

import numpy as np
import pytest

from flowcontrol_tpu.core.actuator import CYLINDER_ACTUATION_MODE
from flowcontrol_tpu.models.pinball import PinballFlowSolver, pinball_custom_initial_guess


def make_solver(mesh, tmp_path, mode=None, **kw):
    return PinballFlowSolver.make_default(
        Re=30, verbose=0, mesh=mesh, path_out=tmp_path,
        solver_backend="host_lu", precision="f64", mode_actuation=mode, **kw,
    )


@pytest.fixture(scope="module")
def pinball_base(coarse_pinball_mesh, tmp_path_factory):
    fs = make_solver(coarse_pinball_mesh, tmp_path_factory.mktemp("pin"), num_steps=1)
    fs.compute_steady_state(u_ctrl=[0.0] * 3, method="picard", max_iter=5)
    fs.compute_steady_state(
        u_ctrl=[0.0] * 3, method="newton", initial_guess=fs.fields.UP0, max_iter=15
    )
    coeffs = fs.compute_force_coefficients(fs.fields.U0, fs.fields.P0)
    return fs.fields.U0.copy(), fs.fields.P0.copy(), coeffs


def test_pinball_fast(coarse_pinball_mesh, pinball_base, tmp_path):
    u0, p0, coeffs = pinball_base
    fs = make_solver(coarse_pinball_mesh, tmp_path, num_steps=3)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(3):
        y = fs.step(np.zeros(3))
    assert np.isfinite(y).all()
    assert y.shape == (3,)


def test_pinball_force_coefficients_fast(pinball_base):
    """Per-surface (cl, cd) dict (ref: pinballflowsolver.py:202-232):
    top/bottom lift roughly antisymmetric, drag positive."""
    _, _, coeffs = pinball_base
    assert set(coeffs) == {"actuator_mid", "actuator_top", "actuator_bot"}
    cl_top, cd_top = coeffs["actuator_top"]
    cl_bot, cd_bot = coeffs["actuator_bot"]
    assert cd_top > 0 and cd_bot > 0
    assert np.isclose(cl_top, -cl_bot, atol=5e-2)


def test_pinball_rotation_actuation_fast(coarse_pinball_mesh, pinball_base, tmp_path):
    """Rotation actuators impose tangential velocity u_ctrl·d/2 on surfaces."""
    u0, p0, _ = pinball_base
    fs = make_solver(coarse_pinball_mesh, tmp_path, num_steps=2)
    fs._assign_steady_state(u0, p0)
    fs.params_ic.amplitude = 0.0
    fs.initialize_time_stepping()
    fs.step(np.array([1.0, 0.0, 0.0]))
    nodes = fs.space.boundary_vel_nodes(fs.markers.facets("actuator_mid"))
    speed = np.linalg.norm(fs.fields.u_[nodes], axis=1)
    assert np.allclose(speed, 0.5, atol=1e-8)  # u_ctrl * d/2


def test_pinball_suction_mode_fast(coarse_pinball_mesh, tmp_path):
    """SUCTION mode builds the 9-boundary layout with slot actuators."""
    fs = make_solver(
        coarse_pinball_mesh, tmp_path, num_steps=1,
        mode=CYLINDER_ACTUATION_MODE.SUCTION,
    )
    names = set(fs.boundaries)
    assert {"cylinder_top", "cylinder_bot", "cylinder_mid",
            "actuator_top", "actuator_bot", "actuator_mid"} <= names
    for nm in ("actuator_top", "actuator_bot", "actuator_mid"):
        assert len(fs.markers.facets(nm)) > 0


def test_pinball_custom_initial_guess_fast(coarse_pinball_mesh, tmp_path):
    from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace

    space = TaylorHoodSpace.build(coarse_pinball_mesh)
    for mode in ("symmetric", "antisymmetric_top", "antisymmetric_bot"):
        up = pinball_custom_initial_guess(space, mode)
        assert up.shape == (space.n_dofs,)
        u = up[: space.n_vel_dofs].reshape(space.n_vnodes, 2)
        assert np.allclose(np.linalg.norm(u, axis=1), 1.0)


def test_pinball_regression(coarse_pinball_mesh, pinball_base, tmp_path, regression_values):
    vals = regression_values.get("pinball")
    if not vals:
        pytest.skip("regression values not generated")
    u0, p0, _ = pinball_base
    assert np.isclose(np.abs(u0).max(), vals["U0_max"], rtol=1e-8)
    fs = make_solver(coarse_pinball_mesh, tmp_path, num_steps=10)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(3))
    assert np.isclose(fs.t, 0.05, atol=1e-12)
    assert np.isclose(y[0], vals["y1"], rtol=1e-6)
    assert np.isclose(fs.compute_perturbation_energy(), vals["dE"], rtol=1e-6)
    u_full = fs.fields.u_n + fs.fields.U0
    assert np.isclose(np.abs(u_full).max(), vals["U_max"], rtol=1e-6)
