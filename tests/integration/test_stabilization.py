"""Closed-loop stabilization of the cylinder wake with the reference's own
controller Kopt_reduced13.mat — the BASELINE.json headline behavior
(ref: src/examples/cylinder/run_cylinder_example.py:68-103).

Two complementary demonstrations:
1. spectral: the closed-loop generalized eigenproblem moves the unstable
   shedding eigenvalue 0.1326+0.7700j into the left half-plane;
2. nonlinear: dE(t) grows open-loop and decays under feedback from the
   same small initial perturbation.
"""

from pathlib import Path

import numpy as np
import pytest

from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

KOPT = Path("/root/reference/src/examples/cylinder/data_input/Kopt_reduced13.mat")
O1_MESH = Path("/root/reference/src/examples/cylinder/data_input/O1.xdmf")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not KOPT.exists(), reason="reference artifacts not mounted"),
]

MESH_KWARGS = dict(yinf=10.0, n1=4.5, n2=2.2, n3=0.8, segments=100)
BASEFLOWS = Path(__file__).resolve().parents[2] / "flowcontrol_tpu" / "models" / "_baseflows"


def make_fs(tmp_path, **kw):
    fs = CylinderFlowSolver.make_default(
        Re=100, verbose=0, mesh_kwargs=MESH_KWARGS, path_out=tmp_path,
        solver_backend="host_lu", precision="f64", **kw,
    )
    d = np.load(BASEFLOWS / f"cylinder_re100_n{fs.space.n_dofs}.npz")
    fs._assign_steady_state(d["U0"], d["P0"])
    return fs


def test_closed_loop_spectrum_stabilized(tmp_path):
    """λ(E_cl, A_cl) near the shedding mode has Re < 0 with Kopt in the loop
    (u = -K y1 on both slots), while the open loop has Re = +0.133."""
    import scipy.sparse as sp

    from flowcontrol_tpu.core.controller import Controller
    from flowcontrol_tpu.core.operatorgetter import OperatorGetter
    from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

    fs = make_fs(tmp_path, num_steps=1)
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    e = og.get_mass_matrix()
    b = og.get_B()  # (n, 2)
    c = og.get_C()  # (3, n)

    # open loop: unstable shedding mode
    vals = get_mat_vp_shift_invert(a, e, n=4, sigma=0.1 + 0.75j,
                                   return_vectors=False)
    lead_open = vals[np.argmax(vals.real)]
    assert lead_open.real > 0.1

    k = Controller.from_file(KOPT)
    ak, bk, ck, dk = (np.asarray(m, dtype=float) for m in (k.A, k.B, k.C, k.D))
    b_eff = (b[:, 0] + b[:, 1]).reshape(-1, 1)  # same u on both slots
    c_eff = c[0:1, :]  # controller reads sensor 1 (ref: run_cylinder_example.py:84)

    n = a.shape[0]
    nk = ak.shape[0]
    # u = -K y:  E_cl [x; xk]' = [[A - B Dk C, B Ck], [-Bk C, Ak]] [x; xk]
    a_cl = sp.bmat(
        [
            [a - sp.csr_matrix(b_eff @ dk @ c_eff), sp.csr_matrix(b_eff @ ck)],
            [sp.csr_matrix(-bk @ c_eff), sp.csr_matrix(ak)],
        ],
        format="csr",
    )
    e_cl = sp.block_diag([e, sp.eye(nk)], format="csr")
    for sigma in (0.1 + 0.75j, 0.0 + 0.77j):
        vals_cl = get_mat_vp_shift_invert(a_cl, e_cl, n=6, sigma=sigma,
                                          return_vectors=False)
        assert (vals_cl.real < 0).all(), vals_cl


def test_closed_loop_energy_decay_vs_open_loop_growth(tmp_path):
    """From the same small divergence-free perturbation: open-loop dE grows
    by the shedding instability (2*sigma = +0.265/t.u.); under Kopt
    feedback dE transiently amplifies, peaks, then decays.

    Horizon calibration (why 150 t.u. closed): the closed-loop plant is
    stable but strongly non-normal — its slowest mode sits at
    sigma_cl = -0.0114 + 0.591j (see test_closed_loop_spectrum_stabilized)
    and the IC is transiently amplified ~1.3e4x in energy, peaking near
    t = 42 before the modal decay (energy e-folding ~44 t.u.) takes over.
    A measured linear-regime trajectory: dE 9.5e-8 -> peak 1.26e-3 at
    t = 42.5 -> 2.0e-5 at t = 150 (1.6% of peak). Short horizons therefore
    CANNOT show absolute decay — any test asserting dE(T) < dE(0) for
    T ≲ 100 would reject a correctly stabilizing controller. The IC
    amplitude 1e-3 keeps the transient peak amplitude ~0.05, inside the
    linear-ish regime; at amplitude 0.01 the transient saturates the
    controller and the wake escapes to the limit cycle."""
    from flowcontrol_tpu.core.controller import Controller

    sample_every = 500

    def run(closed: bool, n_steps: int):
        fs = make_fs(tmp_path / ("cl" if closed else "ol"), num_steps=n_steps)
        fs.params_ic.amplitude = 1e-3
        fs.initialize_time_stepping()
        k = Controller.from_file(KOPT)
        y = fs.y_meas
        des = [fs.compute_perturbation_energy()]
        for i in range(n_steps):
            if closed:
                u = k.step(-y[0], fs.params_time.dt)
                y = fs.step(np.array([u[0], u[0]]))
            else:
                y = fs.step(np.zeros(2))
            if (i + 1) % sample_every == 0:
                des.append(fs.compute_perturbation_energy())
        return np.array(des)

    des_ol = run(closed=False, n_steps=7500)   # t = 37.5
    des_cl = run(closed=True, n_steps=30000)   # t = 150
    # (a) open loop: the shedding instability grows by orders of magnitude
    assert des_ol[-1] > 1e4 * des_ol[0], (des_ol[0], des_ol[-1])
    # (b) feedback suppresses the energy by orders of magnitude at equal T
    i_T = 7500 // sample_every
    assert des_cl[i_T] < 0.05 * des_ol[-1], (des_cl[i_T], des_ol[-1])
    # (c) the closed loop peaks mid-run and decays afterward
    peak = des_cl.argmax()
    assert peak < 0.5 * len(des_cl), f"transient peak too late: {peak}"
    assert des_cl[-1] < 0.2 * des_cl[peak], (des_cl[peak], des_cl[-1])
    # (d) and ends far below the open loop's t=37.5 energy
    assert des_cl[-1] < 1e-2 * des_ol[-1]
