"""Hopf-bifurcation baselines (ref: src/examples/cylinder/
run_cylinder_example.py:4 — "cylinder flow ... unstable above Re_c ~ 46";
lidcavityflowsolver.py:3 — "Supercritical Hopf bifurcation near Re_c=7700").

Measured sweeps:
- cylinder, 14.6k-dof graded mesh (tools/bifurcation_sweep.py):
    Re=40: -0.0301+0.761j   Re=46: -0.00115+0.772j
    Re=47: +0.00320+0.773j  Re=52: +0.0232+0.779j
  → Re_c ≈ 46.3, crossing frequency ~0.77 (the vortex-shedding mode).
- lid cavity, n=48 wall-stretched mesh (tools/lidcavity_hopf_sweep.py):
    Re=6000: -0.0202+0.962j   Re=7400: -0.0159+0.960j
    Re=7700: -0.0078+2.839j   Re=8000: +0.0018+2.832j
  → crossing in (7700, 8000); the unstable branch is the omega~2.8 mode
  that overtakes the omega~0.96 branch above Re~7400.
"""

import numpy as np
import pytest

from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

MESH_KWARGS = dict(yinf=10.0, n1=4.5, n2=2.2, n3=0.8, segments=100)


def leading_eig(Re: float) -> complex:
    fs = CylinderFlowSolver.make_default(
        Re=Re, num_steps=1, verbose=0, mesh_kwargs=MESH_KWARGS,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(method="picard", max_iter=3, tol=1e-7,
                            u_ctrl=[0.0, 0.0])
    fs.compute_steady_state(method="newton", max_iter=25, u_ctrl=[0.0, 0.0],
                            initial_guess=fs.fields.UP0)
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    e = og.get_mass_matrix()
    vals = get_mat_vp_shift_invert(a, e, n=4, sigma=0.0 + 0.75j,
                                   return_vectors=False)
    return vals[np.argmax(vals.real)]


@pytest.mark.slow
def test_cylinder_hopf_bifurcation_near_re46():
    """The leading eigenvalue crosses the imaginary axis between Re=46 and
    Re=47, bracketing the documented Re_c ~ 46 within +-1."""
    lo = leading_eig(46.0)
    hi = leading_eig(47.0)
    assert lo.real < 0, lo
    assert hi.real > 0, hi
    # the crossing mode is the vortex-shedding branch (omega ~ 0.77)
    assert 0.7 < lo.imag < 0.85
    assert 0.7 < hi.imag < 0.85
    # linear interpolation of the crossing point
    re_c = 46.0 + (0.0 - lo.real) / (hi.real - lo.real)
    assert 45.5 < re_c < 47.0, re_c


@pytest.mark.slow
def test_lidcavity_hopf_bifurcation_near_re7700():
    """The lid-cavity base flow is stable at Re=7400 and unstable at
    Re=8000 on the wall-stretched mesh, bracketing the documented
    Re_c ~ 7700 (ref: lidcavityflowsolver.py:3). Newton continuation in Re
    (uniform meshes cannot resolve the Re^-1/2 wall layers and stall)."""
    from flowcontrol_tpu.mesh.generation import lidcavity_mesh
    from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver

    mesh = lidcavity_mesh(48, stretch=2.0)
    up0 = None
    leads = {}
    for Re in (1000, 2500, 4000, 5500, 6500, 7400, 8000):
        fs = LidCavityFlowSolver.make_default(
            Re=Re, num_steps=1, verbose=0, mesh=mesh,
            solver_backend="host_lu", precision="f64",
        )
        if up0 is None:
            fs.compute_steady_state(method="picard", max_iter=6, u_ctrl=[0.0])
            fs.compute_steady_state(method="newton", max_iter=30,
                                    u_ctrl=[0.0], initial_guess=fs.fields.UP0)
        else:
            fs.compute_steady_state(method="newton", max_iter=30,
                                    u_ctrl=[0.0], initial_guess=up0)
        up0 = fs.fields.UP0.copy()
        if Re < 7000:
            continue
        og = OperatorGetter(fs)
        a = og.get_A(autodiff=False)
        e = og.get_mass_matrix()
        best = None
        for sigma in (0.0 + 1.0j, 0.0 + 3.0j):
            vals = get_mat_vp_shift_invert(a, e, n=4, sigma=sigma,
                                           return_vectors=False)
            lead = vals[np.argmax(vals.real)]
            if best is None or lead.real > best.real:
                best = lead
        leads[Re] = best
    assert leads[7400].real < 0, leads
    assert leads[8000].real > 0, leads
    # the unstable branch is the omega~2.8 mode
    assert 2.5 < abs(leads[8000].imag) < 3.2, leads
