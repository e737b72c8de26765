"""Controller: ZOH stepping, algebra, .mat I/O (ref: tests/test_controller.py)."""

import numpy as np
import pytest
import scipy.linalg as sla
import scipy.signal

from flowcontrol_tpu.core.controller import Controller, read_matfile, write_matfile
from flowcontrol_tpu.utils.statespace import StateSpace, c2d_zoh, ss_inv


@pytest.fixture
def siso():
    return Controller.from_matrices(
        A=np.array([[-1.0, 1.0], [0.0, -2.0]]),
        B=np.array([[0.0], [1.0]]),
        C=np.array([[1.0, 0.0]]),
        D=np.array([[0.0]]),
    )


def test_zoh_matches_scipy(siso):
    dt = 0.05
    ad, bd, _, _ = c2d_zoh(siso, dt)
    sysd = scipy.signal.cont2discrete(
        (siso.A, siso.B, siso.C, siso.D), dt, method="zoh"
    )
    assert np.allclose(ad, sysd[0])
    assert np.allclose(bd, sysd[1])


def test_zoh_singular_A():
    k = Controller.from_matrices(
        A=np.zeros((2, 2)), B=np.eye(2), C=np.eye(2), D=np.zeros((2, 2))
    )
    ad, bd, _, _ = c2d_zoh(k, 0.1)
    assert np.allclose(ad, np.eye(2))
    assert np.allclose(bd, 0.1 * np.eye(2))


def test_step_equals_manual_recurrence(siso):
    dt = 0.01
    ad, bd, cd, dd = c2d_zoh(siso, dt)
    x = np.zeros(2)
    ys = [0.3, -0.2, 1.0, 0.5]
    for y in ys:
        u_ref = cd @ x + dd @ np.atleast_1d(y)
        x = ad @ x + bd @ np.atleast_1d(y)
        u = siso.step(np.atleast_1d(y), dt)
        assert np.allclose(u, u_ref)
    assert np.allclose(siso.x, x)


def test_step_approximates_ct_response(siso):
    """ZOH-stepped output converges to the exact continuous step response."""
    dt = 1e-3
    n = 1000
    for _ in range(n):
        u = siso.step(np.array([1.0]), dt)
    t = n * dt
    # exact step response of C(sI-A)^{-1}B at t=1 via expm integration
    aug = np.block([[siso.A, siso.B], [np.zeros((1, 3))]])
    em = sla.expm(aug * t)
    x_exact = em[:2, 2]
    y_exact = (siso.C @ x_exact)[0]
    assert abs(u[0] - y_exact) < 1e-3


def test_mimo_step():
    k = Controller.from_matrices(
        A=np.array([[-1.0, 0.5, 0], [0.2, -1, 0], [0.0, 1.0, -1.0]]),
        B=np.array([[0, 1.0], [1, 0], [0.5, 0.5]]),
        C=0.5 * np.eye(3),
        D=np.zeros((3, 2)),
        x0=np.array([1.0, 2, 3]),
    )
    u = k.step(np.array([1.2, -1.3]), 0.1)
    assert u.shape == (3,)
    assert np.isfinite(u).all()


def test_reset(siso):
    siso.step(np.array([1.0]), 0.1)
    assert np.abs(siso.x).max() > 0
    siso.reset()
    assert np.allclose(siso.x, 0.0)


def test_add_parallel(siso):
    k2 = Controller.from_matrices(
        A=np.array([[-3.0]]), B=np.array([[1.0]]), C=np.array([[2.0]]), D=0.0
    )
    ksum = siso + k2
    assert isinstance(ksum, Controller)
    assert ksum.nstates == 3
    w = np.array([0.0, 0.7, 2.1])
    h = ksum.frequency_response(w)
    href = siso.frequency_response(w) + k2.frequency_response(w)
    assert np.allclose(h, href)


def test_mul_series(siso):
    k2 = Controller.from_matrices(
        A=np.array([[-3.0]]), B=np.array([[1.0]]), C=np.array([[2.0]]), D=1.0
    )
    kprod = siso * k2
    w = np.array([0.1, 1.0, 5.0])
    h = kprod.frequency_response(w)
    href = siso.frequency_response(w) * k2.frequency_response(w)
    assert np.allclose(h, href)


def test_state_concat_on_add(siso):
    siso.x = np.array([1.0, 2.0])
    k2 = Controller.from_matrices(
        A=np.array([[-3.0]]), B=np.array([[1.0]]), C=np.array([[2.0]]), D=0.0,
        x0=np.array([5.0]),
    )
    ksum = siso + k2
    assert np.allclose(ksum.x, [1.0, 2.0, 5.0])


def test_inv():
    k = Controller.from_matrices(
        A=np.array([[-2.0]]), B=np.array([[1.0]]), C=np.array([[1.0]]), D=2.0
    )
    kinv = k.inv()
    w = np.array([0.3, 1.7])
    h = k.frequency_response(w) * kinv.frequency_response(w)
    assert np.allclose(h, 1.0)


def test_matfile_roundtrip(tmp_path, siso):
    f = tmp_path / "k.mat"
    write_matfile(f, siso)
    k2 = Controller.from_file(f)
    assert np.allclose(k2.A, siso.A)
    assert np.allclose(k2.D, siso.D)


def test_reads_reference_controller_format(tmp_path):
    """Round-trip through the exact dict layout scipy.io produces for the
    reference's Kopt .mat files (A, B, C, D keys)."""
    import scipy.io as sio

    a = np.array([[-1.0, 0.0], [1.0, -2.0]])
    sio.savemat(tmp_path / "k.mat", {"A": a, "B": np.eye(2)[:, :1],
                                     "C": np.eye(2)[:1], "D": np.zeros((1, 1))})
    m = read_matfile(tmp_path / "k.mat")
    assert np.allclose(m["A"], a)


def test_feedback():
    g = StateSpace(np.array([[-1.0]]), np.array([[1.0]]), np.array([[1.0]]), 0.0)
    cl = g.feedback()  # unity negative feedback: 1/(s+2)
    p = np.sort(cl.poles())
    assert np.allclose(p, [-2.0])


def test_ss_inv_identity():
    g = StateSpace(np.array([[-1.0]]), np.array([[1.0]]), np.array([[1.0]]), 3.0)
    gi = ss_inv(g)
    w = np.array([0.5, 2.0])
    assert np.allclose(g.frequency_response(w) * gi.frequency_response(w), 1.0)


def test_discrete_native_controller_roundtrip(tmp_path):
    """Controllers exported with a sampling period (dlqg_regulator
    artifacts) step with their stored matrices verbatim, refuse a
    mismatched dt, and survive the .mat roundtrip."""
    import pytest

    from flowcontrol_tpu.utils.lticontrol import export_controller
    from flowcontrol_tpu.utils.statespace import StateSpace

    ad = np.array([[0.9, 0.1], [0.0, 0.8]])
    bd = np.array([[0.0], [1.0]])
    cd = np.array([[1.0, 0.0]])
    k = StateSpace(ad, bd, cd, np.zeros((1, 1)))
    f = tmp_path / "kd.mat"
    export_controller(f, k, dt=0.01)
    K = Controller.from_file(f)
    assert K.native_dt == 0.01
    # the stored matrices ARE the discrete step (no ZOH re-integration)
    u1 = K.step(y=np.array([1.0]), dt=0.01)
    assert np.allclose(u1, cd @ np.zeros(2))
    assert np.allclose(K.x, bd[:, 0])
    a2, b2, c2, d2 = K.discrete(0.01)
    assert np.allclose(a2, ad) and np.allclose(b2, bd)
    with pytest.raises(ValueError):
        K.step(y=np.array([1.0]), dt=0.02)
