"""Unit tests: parameters, actuators, sensors, exporter, physics, optim.

Mirrors the reference's per-component unit modules
(ref: tests/test_{flowsolverparameters,actuator,sensor,exporter,physics,
optim_algs}.py).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import flowcontrol_tpu.core.flowsolverparameters as fsp
from flowcontrol_tpu.core.actuator import (
    ACTUATOR_TYPE,
    ActuatorBCParabolicV,
    ActuatorBCRotation,
    ActuatorBCUniformU,
    ActuatorForceGaussianV,
)
from flowcontrol_tpu.core.exporter import FlowExporter
from flowcontrol_tpu.core.flowfield import FlowFieldCollection, SimPaths
from flowcontrol_tpu.core.sensor import SENSOR_TYPE, SensorPoint


# ── Parameters (ref: tests/test_flowsolverparameters.py) ─────────────────────


def test_param_counts_auto():
    pc = fsp.ParamControl(
        sensor_list=[SensorPoint(sensor_type=SENSOR_TYPE.U, position=[0, 0])],
        actuator_list=[],
    )
    assert pc.sensor_number == 1
    assert pc.actuator_number == 0


def test_param_time_tfinal():
    pt = fsp.ParamTime(num_steps=100, dt=0.01, Tstart=0.0)
    assert pt.Tfinal == 1.0


def test_param_user_data():
    pf = fsp.ParamFlow(Re=100)
    pf.user_data["D"] = 2.0
    assert pf.user_data["D"] == 2.0
    assert pf.uinf == 1.0


def test_param_mesh_requires_source():
    with pytest.raises(ValueError):
        fsp.ParamMesh()


def test_flowsolver_validation(small_mesh):
    from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver

    with pytest.raises(ValueError):
        LidCavityFlowSolver.make_default(Re=-1, n_mesh=4, path_out="/tmp/x")


# ── Actuators (ref: tests/test_actuator.py) ──────────────────────────────────


def test_parabolic_profile():
    act = ActuatorBCParabolicV(width=0.2, position_x=0.0)
    x = np.array([[0.0, 0.5], [0.1, 0.5], [0.2, 0.5], [0.3, 0.5], [-0.2, 0.5]])
    p = act.profile(x)
    assert p[0, 1] == pytest.approx(1.0)  # unit peak at center
    assert p[0, 0] == 0.0  # x-component zero
    assert p[1, 1] == pytest.approx(1 - (0.1 / 0.2) ** 2 * 1.0, rel=1e-12)
    assert p[2, 1] == 0.0  # slot edge
    assert p[3, 1] == 0.0  # outside
    assert p[4, 1] == 0.0


def test_angular_width():
    w = ActuatorBCParabolicV.angular_size_deg_to_width(10, 0.5)
    assert w == pytest.approx(0.5 * np.sin(np.deg2rad(5)))


def test_rotation_profile_tangential():
    act = ActuatorBCRotation(position_x=0.0, position_y=0.0, diameter=1.0)
    th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    x = 0.5 * np.stack([np.cos(th), np.sin(th)], axis=1)
    p = act.profile(x)
    # tangential: p ⟂ r, |p| = d/2
    assert np.allclose(np.einsum("ij,ij->i", p, x), 0.0, atol=1e-14)
    assert np.allclose(np.linalg.norm(p, axis=1), 0.5)


def test_uniform_profile():
    act = ActuatorBCUniformU()
    p = act.profile(np.zeros((3, 2)))
    assert np.allclose(p, [[1, 0]] * 3)


def test_force_gaussian_types():
    act = ActuatorForceGaussianV(sigma=0.1, position=np.array([0.0, 0.0]))
    assert act.actuator_type is ACTUATOR_TYPE.FORCE
    p = act.profile(np.array([[0.0, 0.0], [10.0, 0.0]]))
    assert p[0, 1] == pytest.approx(1.0)  # eta=1 before load
    assert p[1, 1] < 1e-10


# ── Sensors (ref: tests/test_sensor.py) ──────────────────────────────────────


class _MockFS:
    def __init__(self, space, geom):
        self.space = space
        self.geom = geom


def test_sensor_point_reads_field(small_space, small_geom):
    fs = _MockFS(small_space, small_geom)
    s = SensorPoint(sensor_type=SENSOR_TYPE.U, position=np.array([0.3, 0.7]))
    s.load(fs)
    u = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 0] + 2 * x[:, 1], x[:, 1]], axis=1)
    )
    up = np.concatenate([u.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    assert s.eval(up) == pytest.approx(0.3 + 1.4, rel=1e-12)


def test_sensor_pressure(small_space, small_geom):
    fs = _MockFS(small_space, small_geom)
    s = SensorPoint(sensor_type=SENSOR_TYPE.P, position=np.array([0.5, 0.25]))
    s.load(fs)
    p = small_space.interpolate_pressure(lambda x: x[:, 0] * x[:, 1])
    up = np.concatenate([np.zeros(small_space.n_vel_dofs), p])
    assert s.eval(up) == pytest.approx(0.125, rel=1e-12)


def test_wall_shear_sensor(small_space, small_geom):
    from flowcontrol_tpu.core.sensor import SensorHorizontalWallShear

    class FS(_MockFS):
        pass

    fs = FS(small_space, small_geom)
    s = SensorHorizontalWallShear(
        sensor_index=100, x_sensor_left=0.25, x_sensor_right=0.75,
        y_sensor=0.0, sensor_type=SENSOR_TYPE.OTHER,
    )
    s.load(fs)
    # u = (y^2, 0): du/dy = 2y = 0 at the wall... use u=(y,0): du/dy = 1
    u = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 1], np.zeros(len(x))], axis=1)
    )
    up = np.concatenate([u.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    assert s.eval(up) == pytest.approx(0.5, rel=1e-10)  # ∫ 1 ds over length 0.5


# ── Exporter (ref: tests/test_exporter.py) ───────────────────────────────────


@pytest.fixture
def paths(tmp_path):
    return SimPaths(
        U0=tmp_path / "steady/U0.h5", P0=tmp_path / "steady/P0.h5",
        steady_meta=tmp_path / "steady/meta.json",
        U=tmp_path / "U.h5", P=tmp_path / "P.h5", Uprev=tmp_path / "Up.h5",
        U_restart=tmp_path / "Ur.h5", Uprev_restart=tmp_path / "Upr.h5",
        P_restart=tmp_path / "Pr.h5",
        timeseries=tmp_path / "ts.csv", metadata=tmp_path / "meta.json",
        mesh=None,
    )


def test_exporter_timeseries_columns(paths, small_space):
    ex = FlowExporter(paths, FlowFieldCollection(), small_space,
                      Tstart=0.0, dt=0.01, save_every=2)
    ex.log_ic(t=0.0, y_meas=[0.1, 0.2], dE=0.5)
    ex.log(u_ctrl=[1.0], y_meas=[0.3, 0.4], dE=0.6, t=0.01, runtime=0.001)
    df = ex.to_dataframe()
    assert list(df.columns)[:3] == ["time", "dE", "runtime"]
    assert df["y_meas_1"].iloc[1] == 0.3
    assert np.isnan(df["u_ctrl_1"].iloc[0])  # IC row has no control
    ex.write_timeseries()
    assert paths.timeseries.exists()


def test_exporter_metadata_schema(paths, small_space):
    ex = FlowExporter(paths, FlowFieldCollection(), small_space,
                      Tstart=0.5, dt=0.01, save_every=3)
    ex.write_metadata(restart_order=2)
    meta = json.loads(paths.metadata.read_text())
    # exact sidecar schema (ref: exporter.py:234-262)
    assert meta == {
        "Tstart": 0.5, "dt": 0.01, "save_every": 3,
        "checkpoints_written": 0, "restart_order": 2,
        "files": {"U": "Ur.h5", "Uprev": "Upr.h5", "P": "Pr.h5"},
    }


def test_exporter_snapshot_baseflow_adjust(paths, small_space):
    fields = FlowFieldCollection()
    nvn, npd = small_space.n_vnodes, small_space.n_pressure_dofs
    fields.U0 = np.ones((nvn, 2))
    fields.P0 = np.full(npd, 2.0)
    ex = FlowExporter(paths, fields, small_space, dt=0.01, save_every=1)
    u = 0.1 * np.ones((nvn, 2))
    ex.export_snapshots(u, u, np.zeros(npd), time=0.0, adjust_baseflow=1.0)
    ex.close()
    from flowcontrol_tpu.mesh.io import read_field_snapshot

    usave = read_field_snapshot(paths.U_restart, "U", 0)
    assert np.allclose(usave, 1.1)  # perturbation + base flow
    psave = read_field_snapshot(paths.P_restart, "P", 0)
    assert np.allclose(psave, 2.0)


# ── Physics (ref: tests/test_physics.py) ─────────────────────────────────────


def test_div0_perturbation_is_divergence_free(medium_space, medium_geom):
    from flowcontrol_tpu.utils.physics import compute_divergence, get_div0_u_callable
    from flowcontrol_tpu.fem.projection import project_velocity

    fs = _MockFS(medium_space, medium_geom)
    u = project_velocity(medium_geom, medium_space,
                         get_div0_u_callable(0.5, 0.5, 0.25))
    div = compute_divergence(fs, u)
    # weak divergence small relative to the field magnitude
    assert np.abs(div).max() < 0.05 * np.abs(u).max()


def test_vorticity_of_rigid_rotation(small_space, small_geom):
    from flowcontrol_tpu.utils.physics import compute_vorticity

    fs = _MockFS(small_space, small_geom)
    u = small_space.interpolate_velocity(
        lambda x: np.stack([-(x[:, 1] - 0.5), x[:, 0] - 0.5], axis=1)
    )
    w = compute_vorticity(fs, u)
    assert np.allclose(w, 2.0, atol=1e-10)


# ── Optim (ref: tests/test_optim_algs.py) ────────────────────────────────────


def test_minimize_nm_quadratic():
    from flowcontrol_tpu.utils.optim_algs import minimize

    res = minimize(lambda x: ((x - 2.0) ** 2).sum(), np.zeros(2), "nm",
                   {"maxfev": 200}, verbose=False)
    assert np.allclose(res.x, 2.0, atol=1e-2)


def test_minimize_pop_batched():
    from flowcontrol_tpu.utils.optim_algs import minimize

    def batch_cost(X):
        return ((X - 1.5) ** 2).sum(axis=1)

    res = minimize(None, np.zeros(3), "pop",
                   {"n_iter": 30, "popsize": 16, "sigma0": 1.0},
                   verbose=False, batch_costfun=batch_cost)
    assert np.allclose(res.x, 1.5, atol=0.2)


def test_minimize_dfo_builtin_quadratic():
    """'dfo' must be a live path without blackbox_opt (built-in fallback)."""
    from flowcontrol_tpu.utils.optim_algs import minimize

    res = minimize(lambda x: ((x - 0.7) ** 2).sum() + 1.0, np.zeros(2),
                   "dfo", {"maxfev": 500}, verbose=False)
    assert res.success
    assert np.allclose(res.x, 0.7, atol=5e-3)
    assert res.fun < 1.0 + 1e-4


def test_minimize_bo_builtin_quadratic():
    """'bo' must be a live path without smt (built-in GP-EI fallback)."""
    from flowcontrol_tpu.utils.optim_algs import minimize

    res = minimize(
        lambda x: ((x - 0.25) ** 2).sum(), np.array([0.8]), "bo",
        {"n_iter": 15, "n_doe": 6, "xlimits": [[0.0, 1.0]],
         "random_state": 0},
        verbose=False,
    )
    assert res.success
    assert res.fun < 0.02
    assert res.nfev == 6 + 15


def test_optim_helpers():
    from flowcontrol_tpu.utils.optim import (
        compute_control_cost,
        compute_signal_cost,
        cummin,
        sobol_sample,
    )

    j = np.array([3.0, 2.0, 5.0, 1.0])
    assert np.allclose(cummin(j), [3, 2, 2, 1])
    x = sobol_sample(8, 2, bounds=[(-1, 1), (0, 2)])
    assert x.shape == (8, 2)
    assert (x[:, 0] >= -1).all() and (x[:, 1] <= 2).all()
    assert compute_signal_cost(np.ones(5), 0.1, "integral") == pytest.approx(0.5)
    assert compute_signal_cost(np.arange(5.0), 0.1, "terminal") == 4.0
    assert compute_control_cost(np.ones((5, 2)), 0.1) == pytest.approx(1.0)


def test_construct_simplex():
    from flowcontrol_tpu.utils.optim_algs import construct_simplex

    s = construct_simplex(np.array([1.0, 2.0]), rectangular=True, edgelen=0.5)
    assert s.shape == (3, 2)
    assert np.allclose(s[0], [1, 2])
    assert np.allclose(s[1], [1.5, 2])
