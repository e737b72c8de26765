"""Lid-driven cavity integration (ref: tests/integration/test_lidcavity.py)."""

import numpy as np
import pytest

from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver


def make_solver(tmp_path, Re=1000, **kw):
    return LidCavityFlowSolver.make_default(
        Re=Re, verbose=0, n_mesh=32, path_out=tmp_path,
        solver_backend="host_lu", precision="f64", **kw,
    )


@pytest.fixture(scope="module")
def lid_base(tmp_path_factory):
    fs = make_solver(tmp_path_factory.mktemp("lid"), num_steps=1)
    fs.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=5)
    fs.compute_steady_state(
        u_ctrl=[0.0], method="newton", initial_guess=fs.fields.UP0, max_iter=15
    )
    return fs.fields.U0.copy(), fs.fields.P0.copy()


def test_lidcavity_fast(lid_base, tmp_path):
    u0, p0 = lid_base
    fs = make_solver(tmp_path, num_steps=3)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(3):
        y = fs.step(np.zeros(1))
    assert np.isfinite(y).all()
    # enclosed flow: auto pressure pinning must be active
    bcset = fs._bcset_perturbation()
    assert 2 * fs.space.n_vnodes in bcset.dofs


def test_lidcavity_base_flow_ghia_fast(lid_base):
    """Centerline u_x(0.5, y) vs Ghia et al. (1982) Table I, Re=1000.

    Checks the actual profile at published (y, u) stations, not just the
    lid BC. 32x32 Taylor-Hood (65x65 P2 nodes) resolves these to a few
    percent of the lid velocity.
    """
    from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace
    from flowcontrol_tpu.mesh.generation import lidcavity_mesh

    u0, _ = lid_base
    assert np.isclose(np.abs(u0).max(), 1.0, atol=1e-10)  # lid velocity

    mesh = lidcavity_mesh(32)
    space = TaylorHoodSpace.build(mesh)
    xs = space.vel_node_coords
    sel = np.abs(xs[:, 0] - 0.5) < 1e-9
    ys = xs[sel, 1]
    order = np.argsort(ys)
    ys, us = ys[order], u0[sel, 0][order]
    # Ghia, Ghia & Shin (1982), Table I, Re=1000 (129x129 grid)
    ghia = [
        (0.9766, 0.65928),
        (0.8516, 0.33304),
        (0.5000, -0.06080),
        (0.2813, -0.27805),
        (0.1719, -0.38289),
        (0.0625, -0.20196),
    ]
    for y_ref, u_ref in ghia:
        u_interp = np.interp(y_ref, ys, us)
        assert abs(u_interp - u_ref) < 0.035, (
            f"u(0.5,{y_ref}) = {u_interp:.4f}, Ghia = {u_ref:.4f}"
        )
    # global minimum location/value
    u_min = us.min()
    assert -0.42 < u_min < -0.33  # Ghia: -0.38289


def test_lidcavity_lid_actuation_fast(lid_base, tmp_path):
    """Lid actuator adds uniform u on the lid (perturbation BC)."""
    u0, p0 = lid_base
    fs = make_solver(tmp_path, num_steps=2)
    fs._assign_steady_state(u0, p0)
    fs.params_ic.amplitude = 0.0
    fs.initialize_time_stepping()
    fs.step(np.array([0.3]))
    # lid velocity perturbation equals the control amplitude
    lid_nodes = fs.space.boundary_vel_nodes(fs.markers.facets("lid"))
    # exclude corner nodes shared with the side walls (walls BC wins there)
    xs = fs.space.vel_node_coords[lid_nodes]
    interior = (xs[:, 0] > 1e-9) & (xs[:, 0] < 1 - 1e-9)
    assert np.allclose(fs.fields.u_[lid_nodes[interior], 0], 0.3, atol=1e-10)


def test_lidcavity_regression(lid_base, tmp_path, regression_values):
    vals = regression_values.get("lidcavity")
    if not vals:
        pytest.skip("regression values not generated")
    u0, p0 = lid_base
    fs = make_solver(tmp_path, num_steps=10)
    fs._assign_steady_state(u0, p0)
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(np.zeros(1))
    assert np.isclose(fs.t, 0.05, atol=1e-12)
    assert np.isclose(y[0], vals["y1"], rtol=1e-6)
    assert np.isclose(y[1], vals["y2"], rtol=1e-6)
    assert np.isclose(fs.compute_perturbation_energy(), vals["dE"], rtol=1e-6)
    u_full = fs.fields.u_n + fs.fields.U0
    assert np.isclose(np.abs(u_full).max(), vals["U_max"], rtol=1e-6)


def test_lidcavity_ghia_centerline(lid_base):
    """Centerline u_x minimum vs Ghia et al. (1982) at Re=1000 (-0.3829)."""
    import numpy as np

    from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace
    from flowcontrol_tpu.mesh.generation import lidcavity_mesh

    u0, _ = lid_base
    mesh = lidcavity_mesh(32)
    space = TaylorHoodSpace.build(mesh)
    xs = space.vel_node_coords
    sel = np.abs(xs[:, 0] - 0.5) < 1e-9
    u_min = u0[sel, 0].min()
    assert -0.45 < u_min < -0.30  # Ghia: -0.3829 (129x129); 32x32 tolerance
