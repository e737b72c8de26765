"""lticontrol validation: norms, Youla, coprime, balred, synthesis.

Mirrors the reference's cross-validation strategy
(ref: tests/test_lticontrol_vs_control.py — validated against
python-control; here against analytic results and system-theoretic
identities, since python-control is not available).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import flowcontrol_tpu.utils.lticontrol as ltc
from flowcontrol_tpu.utils.statespace import StateSpace


def first_order(tau=1.0, k=1.0):
    """k / (tau s + 1)"""
    return StateSpace([[-1.0 / tau]], [[k / tau]], [[1.0]], 0.0)


def second_order(wn=2.0, zeta=0.1, k=1.0):
    return StateSpace(
        [[0.0, 1.0], [-wn**2, -2 * zeta * wn]], [[0.0], [k * wn**2]],
        [[1.0, 0.0]], 0.0,
    )


# ── Norms ────────────────────────────────────────────────────────────────────


def test_h2_norm_first_order():
    # ||k/(tau s + 1)||_2^2 = k^2/(2 tau)
    g = first_order(tau=0.5, k=3.0)
    assert np.isclose(ltc.norm(g, 2), np.sqrt(9.0 / (2 * 0.5)), rtol=1e-9)


def test_hinf_norm_first_order():
    g = first_order(tau=2.0, k=5.0)
    assert np.isclose(ltc.norm(g, np.inf), 5.0, rtol=1e-6)


def test_hinf_norm_resonant():
    # peak of second order: k / (2 zeta sqrt(1-zeta^2))
    zeta, k = 0.1, 1.0
    g = second_order(wn=2.0, zeta=zeta, k=k)
    expected = k / (2 * zeta * np.sqrt(1 - zeta**2))
    assert np.isclose(ltc.norm(g, np.inf), expected, rtol=1e-5)


def test_norm_unstable_is_inf():
    g = StateSpace([[1.0]], [[1.0]], [[1.0]], 0.0)
    assert ltc.norm(g, 2) == np.inf
    assert ltc.norm(g, np.inf) == np.inf


# ── Stacking / LFT ───────────────────────────────────────────────────────────


def test_stacks_shapes():
    g = first_order()
    v = ltc.ss_vstack(g, g)
    h = ltc.ss_hstack(g, g)
    d = ltc.ss_blkdiag_list([g, g])
    assert (v.noutputs, v.ninputs) == (2, 1)
    assert (h.noutputs, h.ninputs) == (1, 2)
    assert (d.noutputs, d.ninputs) == (2, 2)


def test_lft_identity():
    """LFT of [[0, I],[I, 0]] with K returns K."""
    p = StateSpace(
        np.zeros((0, 0)), np.zeros((0, 2)), np.zeros((2, 0)),
        np.array([[0.0, 1.0], [1.0, 0.0]]),
    )
    k = first_order()
    cl = ltc.lft(p, k)
    w = np.array([0.1, 1.0, 3.0])
    assert np.allclose(cl.frequency_response(w), k.frequency_response(w))


# ── LQR / LQG ────────────────────────────────────────────────────────────────


def test_lqr_stabilizes():
    a = np.array([[0.0, 1.0], [2.0, -0.3]])  # unstable
    b = np.array([[0.0], [1.0]])
    k, p = ltc.lqr(a, b, np.eye(2), np.eye(1))
    assert np.all(np.linalg.eigvals(a - b @ k).real < 0)
    assert np.all(np.linalg.eigvalsh(p) > 0)


def test_lqg_regulator_stabilizes_closed_loop():
    g = StateSpace([[0.5, 1.0], [0.0, -2.0]], [[0.0], [1.0]], [[1.0, 0.0]], 0.0)
    klqg, f, l = ltc.lqg_regulator(g, 1.0, 1.0, 1.0, 1.0)
    # positive feedback convention (ref uses feedback(G, K, +1))
    assert ltc.isstablecl(g, klqg, sign=+1)


# ── Youla ────────────────────────────────────────────────────────────────────


@pytest.fixture
def plant_and_k0():
    g = StateSpace([[0.2, 1.0], [0.0, -1.0]], [[0.0], [1.0]], [[1.0, 0.0]], 0.0)
    k0, _, _ = ltc.lqg_regulator(g, 1.0, 1.0, 1.0, 1.0)
    return g, k0


def test_youla_q_zero_returns_k0(plant_and_k0):
    g, k0 = plant_and_k0
    q = StateSpace(np.zeros((0, 0)), np.zeros((0, 1)), np.zeros((1, 0)), 0.0)
    k = ltc.youla(g, k0, q)
    w = np.array([0.1, 1.0, 10.0])
    assert np.allclose(
        k.frequency_response(w), k0.frequency_response(w), atol=1e-8
    )


def test_youla_stable_q_keeps_stability(plant_and_k0):
    g, k0 = plant_and_k0
    for theta in ([0.5], [0.2, -0.4], [1.0, 0.3, -0.2]):
        k = ltc.youla_laguerre(g, k0, p=2.0, theta=theta)
        assert ltc.isstablecl(g, k, sign=+1), theta


def test_youla_qab_roundtrip(plant_and_k0):
    """Youla(G, K0, Q0b(Ka)) reproduces Ka."""
    g, k0 = plant_and_k0
    ka = ltc.youla_laguerre(g, k0, p=1.5, theta=[0.3, -0.1])
    q0b = ltc.youla_Q0b(ka, k0, g)
    k_rec = ltc.youla(g, k0, q0b)
    w = np.array([0.05, 0.5, 5.0])
    assert np.allclose(
        k_rec.frequency_response(w), ka.frequency_response(w), atol=1e-6
    )


def test_youla_K00_constraint(plant_and_k0):
    g, k0 = plant_and_k0
    k = ltc.youla_laguerre_K00(g, k0, p=2.0, theta=[0.1, -0.2])
    assert abs(np.asarray(k.dcgain()).ravel()[0]) < 1e-6
    assert ltc.isstablecl(g, k, sign=+1)


def test_youla_lqg_lft(plant_and_k0):
    g, _ = plant_and_k0
    q = ltc.basis_laguerre_ss(1.0, [0.2])
    k = ltc.youla_lqg(g, 1.0, 1.0, 1.0, 1.0, q)
    assert ltc.isstablecl(g, k, sign=+1)


# ── Laguerre basis ───────────────────────────────────────────────────────────


def test_laguerre_ss_unit_h2_norm():
    """Each Laguerre basis function has unit H2 norm."""
    phi = ltc.basis_laguerre_canonical_ss(1.7, 4)
    for i in range(4):
        e = np.zeros((4, 1))
        e[i] = 1.0
        phi_i = StateSpace(phi.A, phi.B @ e, phi.C, phi.D @ e)
        assert np.isclose(ltc.norm(phi_i, 2), 1.0, rtol=1e-8), i


def test_laguerre_ss_matches_tf():
    p = 2.0
    theta = [0.7, -0.3, 0.2]
    q_ss = ltc.basis_laguerre_ss(p, theta)
    num, den = ltc.basis_laguerre(p, theta)
    w = np.array([0.1, 1.0, 4.0])
    h_ss = q_ss.frequency_response(w)[:, 0, 0]
    h_tf = np.polyval(num, 1j * w) / np.polyval(den, 1j * w)
    assert np.allclose(h_ss, h_tf, rtol=1e-8)


# ── Coprime factorizations ───────────────────────────────────────────────────


def test_rncf_reconstructs_plant():
    g = second_order(wn=1.5, zeta=0.4)
    fact, mr, nr = ltc.rncf(g)
    w = np.array([0.1, 0.7, 3.0])
    h_g = g.frequency_response(w)[:, 0, 0]
    h_m = mr.frequency_response(w)[:, 0, 0]
    h_n = nr.frequency_response(w)[:, 0, 0]
    assert np.allclose(h_g, h_n / h_m, rtol=1e-7)


def test_rncf_normalized():
    """[Mr; Nr] is inner: Mr*Mr + Nr*Nr = 1 on the imaginary axis."""
    g = second_order(wn=1.5, zeta=0.4)
    _, mr, nr = ltc.rncf(g)
    w = np.array([0.0, 0.5, 2.0, 10.0])
    h_m = mr.frequency_response(w)[:, 0, 0]
    h_n = nr.frequency_response(w)[:, 0, 0]
    assert np.allclose(np.abs(h_m) ** 2 + np.abs(h_n) ** 2, 1.0, rtol=1e-7)


def test_lncf_reconstructs_plant():
    g = second_order(wn=0.8, zeta=0.3)
    _, ml, nl = ltc.lncf(g)
    w = np.array([0.1, 0.7, 3.0])
    h_g = g.frequency_response(w)[:, 0, 0]
    h_m = ml.frequency_response(w)[:, 0, 0]
    h_n = nl.frequency_response(w)[:, 0, 0]
    assert np.allclose(h_g, h_n / h_m, rtol=1e-7)


# ── Balanced reduction ───────────────────────────────────────────────────────


def test_balreal_gramians_equal_diagonal():
    g = StateSpace(
        [[-1.0, 0.5, 0], [0, -2.0, 0.3], [0, 0, -5.0]],
        [[1.0], [0.5], [0.2]],
        [[1.0, 0.3, 0.1]],
        0.0,
    )
    gb = ltc.balreal(g)
    wc = ltc.gram(gb, "c")
    wo = ltc.gram(gb, "o")
    assert np.allclose(wc, wo, atol=1e-8)
    assert np.allclose(wc, np.diag(np.diag(wc)), atol=1e-8)


def test_hsv_and_balred_error_bound():
    rng = np.random.default_rng(3)
    n = 8
    a = -np.diag(np.linspace(0.5, 10, n)) + 0.1 * rng.standard_normal((n, n))
    while np.any(np.linalg.eigvals(a).real >= 0):
        a -= 0.5 * np.eye(n)
    g = StateSpace(a, rng.standard_normal((n, 1)), rng.standard_normal((1, n)), 0.0)
    hsv = ltc.sys_hsv(g)
    assert (np.diff(hsv) <= 1e-12).all()  # sorted descending
    gr, hsv2, nr = ltc.balred_rel(g, hsv_threshold=1e-3)
    err = ltc.norm(g - gr, np.inf)
    bound = 2 * hsv[nr:].sum()
    assert err <= bound * 1.01 + 1e-12


def test_hsv_unstable_inf():
    g = StateSpace(np.diag([1.0, -2.0]), [[1.0], [1.0]], [[1.0, 1.0]], 0.0)
    hsv = ltc.sys_hsv(g)
    assert np.isinf(hsv[0]) and np.isfinite(hsv[1])


def test_balred_preserves_unstable_part():
    g_u = StateSpace([[0.5]], [[1.0]], [[1.0]], 0.0)
    g_s = StateSpace(np.diag([-1.0, -20.0]), [[1.0], [0.01]], [[1.0, 0.01]], 0.0)
    g = g_u + g_s
    gr, hsv, nr = ltc.balred_rel(g, hsv_threshold=1e-2)
    # unstable pole kept
    assert np.any(np.abs(np.linalg.eigvals(gr.A) - 0.5) < 1e-8)


def test_stab_unstab_decomp_additive():
    g = StateSpace(
        np.array([[0.7, 1.0], [0.0, -3.0]]), [[1.0], [2.0]], [[1.0, 1.0]], 0.5
    )
    gs, gu = ltc.stab_unstab_decomp(g)
    w = np.array([0.1, 1.0, 5.0])
    h = g.frequency_response(w)
    h2 = gs.frequency_response(w) + gu.frequency_response(w)
    assert np.allclose(h, h2, rtol=1e-8)


# ── Synthesis ────────────────────────────────────────────────────────────────


def test_h2syn_stabilizes():
    # unstable plant, standard-form generalized plant
    g = StateSpace([[1.0]], [[1.0]], [[1.0]], 0.0)
    # P: z = [x; u], y = x + w2; w = [w1; w2]
    p = StateSpace(
        [[1.0]],
        np.array([[1.0, 0.0, 1.0]]),
        np.array([[1.0], [0.0], [1.0]]),
        np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
    )
    k = ltc.h2syn(p, ny=1, nu=1)
    cl = ltc.lft(p, k, ny=1, nu=1)
    assert ltc.isstable(cl)


def test_hinfsyn_stabilizes_and_meets_gamma():
    p = StateSpace(
        [[1.0]],
        np.array([[1.0, 0.0, 1.0]]),
        np.array([[1.0], [0.0], [1.0]]),
        np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
    )
    k, gam = ltc.hinfsyn(p, ny=1, nu=1)
    cl = ltc.lft(p, k, ny=1, nu=1)
    assert ltc.isstable(cl)
    assert ltc.norm(cl, np.inf) <= gam * (1 + 1e-3)
    # known optimum for this standard example is a modest gamma
    assert gam < 10.0


def test_hinfsyn_mref_runs():
    g = first_order(tau=1.0, k=2.0)
    # D11 must vanish (We, Wcl strictly proper); D12/D21 must be full rank
    # (Wu, Wr biproper)
    we = first_order(tau=10.0, k=10.0)
    wu = ltc.ss_one() * 0.1
    wb = ltc.ss_one() * 0.1
    wr = ltc.ss_one()
    wcl = first_order(tau=1.0, k=0.5)
    cl_ref = first_order(tau=0.5, k=1.0)
    k, achieved = ltc.hinfsyn_mref(g, we, wu, wb, wr, cl_ref, wcl, syn="Hinf")
    assert np.isfinite(achieved)
    # negative feedback convention
    assert ltc.isstablecl(g, k, sign=-1)


# ── Residues / slowfast / condswitch ─────────────────────────────────────────


def test_controller_residues_frequency_response():
    rc, rp = [2.0], [-1.0]
    cc, cp = [1.0 + 0.5j], [-0.5 + 2.0j]
    k = ltc.controller_residues(rc, rp, cc, cp)
    w = np.array([0.1, 1.0, 3.0])
    h = k.frequency_response(w)[:, 0, 0]
    s = 1j * w
    h_ref = rc[0] / (s - rp[0]) + cc[0] / (s - cp[0]) + np.conj(cc[0]) / (
        s - np.conj(cp[0])
    )
    assert np.allclose(h, h_ref, rtol=1e-8)


def test_controller_residues_wrapper_matches():
    theta = np.array([2.0, -1.0, 1.0, 0.5, -0.5, 2.0])
    k1 = ltc.controller_residues_wrapper(theta, 1, 1)
    k2 = ltc.controller_residues([2.0], [-1.0], [1.0 + 0.5j], [-0.5 + 2.0j])
    w = np.array([0.3, 2.0])
    assert np.allclose(k1.frequency_response(w), k2.frequency_response(w))


def test_slowfast_recombines():
    g = StateSpace(
        np.diag([-0.1, -50.0]), [[1.0], [1.0]], [[1.0, 2.0]], 0.0
    )
    gs, gf = ltc.slowfast(g, wlim=1.0)
    w = np.array([0.01, 1.0, 100.0])
    h = g.frequency_response(w)
    h2 = gs.frequency_response(w) + gf.frequency_response(w)
    assert np.allclose(h, h2, rtol=1e-7)
    assert np.all(np.abs(np.linalg.eigvals(gs.A)) < 1.0)
    assert np.all(np.abs(np.linalg.eigvals(gf.A)) >= 1.0)


def test_condswitch_consistent_data():
    """State conditioning reproduces data generated by the controller itself."""
    k = StateSpace([[-1.0, 0.4], [0.0, -2.0]], [[1.0], [0.5]], [[1.0, 0.2]], 0.1)
    dt = 0.05
    ad, bd, cd, dd = ltc.c2d(k, dt, "tustin")
    rng = np.random.default_rng(0)
    x = np.array([0.5, -0.3])
    ys, us = [], []
    for _ in range(12):
        y = rng.standard_normal()
        u = cd @ x + dd * y
        x = ad @ x + (bd * y).ravel()
        ys.append(y)
        us.append(float(np.atleast_1d(u).ravel()[0]))
    # signals are consumed newest-first (backward state recursion)
    xn, yhat, uhat = ltc.condswitch(
        np.array(us)[::-1], np.array(ys)[::-1], k, dt,
        w_y=1.0, w_u=1.0, w_decay=1.0,
    )
    assert np.allclose(xn, x, atol=1e-6)
    assert np.allclose(yhat, np.array(ys)[::-1], atol=1e-6)


def test_export_controller(tmp_path):
    k = first_order()
    ltc.export_controller(tmp_path / "k.mat", k)
    d = ltc.read_matfile(tmp_path / "k.mat")
    assert "mag" in d and "A" in d


def test_hinfsyn_d11_static_parrott():
    """With B1=0, C1=0 the optimal gamma equals the Parrott lower bound
    max(sigma([D1111 D1112]), sigma([D1111; D1121]))."""
    A = np.array([[-1.0]])
    B = np.array([[0.0, 0.0, 1.0]])
    C = np.array([[0.0], [0.0], [1.0]])
    D11 = np.array([[0.3, 0.5], [0.2, 0.8]])
    D = np.block([[D11, np.array([[0.0], [1.0]])],
                  [np.array([[0.0, 1.0]]), np.zeros((1, 1))]])
    p = StateSpace(A, B, C, D)
    k, gam = ltc.hinfsyn(p, ny=1, nu=1, tol=1e-6)
    g0 = max(np.linalg.svd(D11[:1, :])[1][0], np.linalg.svd(D11[:, :1])[1][0])
    assert abs(gam - g0) < 1e-4
    cl = ltc.lft(p, k, ny=1, nu=1)
    assert ltc.isstable(cl)
    assert ltc.norm(cl, np.inf) <= gam * (1 + 1e-6)


def test_hinfsyn_d11_random_plants():
    """General D11 != 0: closed loop stable with ||Tzw||inf <= gamma, tight."""
    rng = np.random.default_rng(42)
    for _ in range(4):
        n, nw, nu, nz, ny = 4, 2, 1, 2, 1
        A = rng.standard_normal((n, n))
        A -= (max(np.real(np.linalg.eigvals(A)).max(), 0) + 0.5) * np.eye(n)
        B1 = rng.standard_normal((n, nw))
        B2 = rng.standard_normal((n, nu))
        C1 = rng.standard_normal((nz, n))
        C2 = rng.standard_normal((ny, n))
        D11 = 0.4 * rng.standard_normal((nz, nw))
        D12 = np.vstack([0.3 * rng.standard_normal((nz - nu, nu)),
                         np.eye(nu) + 0.2 * rng.standard_normal((nu, nu))])
        D21 = np.hstack([0.3 * rng.standard_normal((ny, nw - ny)),
                         np.eye(ny) + 0.2 * rng.standard_normal((ny, ny))])
        D22 = 0.1 * rng.standard_normal((ny, nu))
        p = StateSpace(A, np.hstack([B1, B2]), np.vstack([C1, C2]),
                       np.block([[D11, D12], [D21, D22]]))
        k, gam = ltc.hinfsyn(p, ny=ny, nu=nu, tol=1e-4)
        cl = ltc.lft(p, k, ny=ny, nu=nu)
        nrm = ltc.norm(cl, np.inf)
        assert ltc.isstable(cl)
        assert nrm <= gam * 1.001
        # the central controller is tight: achieved norm ~= gamma
        assert nrm >= gam * 0.9


def test_hinfsyn_d11_mimo():
    """MIMO (nz=4, nw=3, nu=2, ny=2) with full D blocks."""
    rng = np.random.default_rng(7)
    n, nw, nu, nz, ny = 5, 3, 2, 4, 2
    A = rng.standard_normal((n, n))
    A -= (max(np.real(np.linalg.eigvals(A)).max(), 0) + 0.5) * np.eye(n)
    p = StateSpace(
        A, rng.standard_normal((n, nw + nu)), rng.standard_normal((nz + ny, n)),
        np.block([
            [0.3 * rng.standard_normal((nz, nw)), rng.standard_normal((nz, nu))],
            [rng.standard_normal((ny, nw)), 0.1 * rng.standard_normal((ny, nu))],
        ]),
    )
    k, gam = ltc.hinfsyn(p, ny=ny, nu=nu, tol=1e-4)
    cl = ltc.lft(p, k, ny=ny, nu=nu)
    assert ltc.isstable(cl)
    assert ltc.norm(cl, np.inf) <= gam * 1.001


# ── Frozen external anchors ──────────────────────────────────────────────────
# tests/data/lti_anchors.json holds values computed by algorithmically
# independent naive methods (Kronecker-product Lyapunov solves, quadrature
# H2, dense-grid + golden-section Linf — tools/generate_lti_anchors.py,
# which shares no code with lticontrol). The reference cross-validates
# against python-control (ref: tests/test_lticontrol_vs_control.py:1-9),
# unavailable here; these frozen tables catch sign/convention drift that
# self-derived identities cannot.

import json
from pathlib import Path

_ANCHORS = Path(__file__).parent / "data" / "lti_anchors.json"


@pytest.fixture(scope="module")
def anchors():
    return json.loads(_ANCHORS.read_text())


def _ss_from_json(d):
    return StateSpace(*(np.asarray(d[k], dtype=float) for k in "ABCD"))


def test_anchor_norms_and_hsv(anchors):
    for name, nd in anchors["norms"].items():
        g = _ss_from_json(anchors["plants"][name])
        assert np.isclose(ltc.norm(g, 2), nd["h2"], rtol=1e-6), name
        assert np.isclose(ltc.norm(g, np.inf), nd["linf"], rtol=1e-5), name
        assert np.allclose(ltc.sys_hsv(g), nd["hsv"], rtol=1e-6), name


def test_anchor_hinfsyn_gamma(anchors):
    for name, hd in anchors["hinfsyn"].items():
        p = _ss_from_json(hd["plant"])
        k, gamma = ltc.hinfsyn(p, hd["ny"], hd["nu"])
        # bisection gamma reproduces the frozen value, and the achieved
        # closed-loop norm matches the naive-grid measurement
        assert np.isclose(gamma, hd["gamma"], rtol=5e-3), (name, gamma)
        cl = ltc.lft(p, k, ny=hd["ny"], nu=hd["nu"])
        assert ltc.isstable(cl)
        assert np.isclose(ltc.norm(cl, np.inf), hd["gamma_cl_naive"],
                          rtol=1e-4), name


def test_anchor_balred_frequency_errors(anchors):
    bd = anchors["balred"]
    g = _ss_from_json(anchors["plants"]["mimo6"])
    hsv = ltc.sys_hsv(g)
    thresh = 0.5 * (hsv[2] + hsv[3]) / hsv[0]
    gr, _, nr = ltc.balred_rel(g, thresh)
    assert nr == bd["order"]

    def resp(ss, w):
        a, b, c, d = (np.atleast_2d(np.asarray(m))
                      for m in (ss.A, ss.B, ss.C, ss.D))
        return c @ np.linalg.solve(1j * w * np.eye(a.shape[0]) - a, b) + d

    for w, e in zip(bd["ws"], bd["err_smax"]):
        smax = np.linalg.svd(resp(g, w) - resp(gr, w), compute_uv=False)[0]
        assert np.isclose(smax, e, rtol=1e-6), w
    assert max(bd["err_smax"]) <= bd["bound_2sum_tail_hsv"] * (1 + 1e-9)


def test_dlqg_regulator_sampled_stability():
    """dlqg_regulator designs in discrete time: the exact sampled
    interconnection is stable by the discrete separation principle, even
    at a dt where a fast compensator's per-loop ZOH would misbehave (the
    failure mode measured on the pinball Re=100 design, round 5)."""
    from scipy.linalg import expm

    rng = np.random.default_rng(3)
    # unstable 4-state plant: one unstable complex pair + damped pair
    a = np.array([[0.2, 1.5, 0, 0], [-1.5, 0.2, 0, 0],
                  [0, 0, -0.4, 3.0], [0, 0, -3.0, -0.4]])
    b = rng.standard_normal((4, 1))
    c = rng.standard_normal((2, 4))
    g = ltc.ss(a, b, c, np.zeros((2, 1)))
    dt = 0.05
    kd, F, L = ltc.dlqg_regulator(g, dt, qx=1.0, ru=1.0, qw=1.0, rv=0.1)
    ad = expm(a * dt)
    bd = np.linalg.solve(a, (ad - np.eye(4))) @ b
    m = np.block([
        [ad, bd @ np.asarray(kd.C)],
        [np.asarray(kd.B) @ c, np.asarray(kd.A)],
    ])
    sr = np.abs(np.linalg.eigvals(m)).max()
    assert sr < 1.0, sr
    # and it actually regulates: closed beats open from a plant IC
    x = np.zeros(8); x[0] = 1.0
    xo = x[:4].copy()
    for _ in range(600):
        x = m @ x
        xo = ad @ xo
    assert np.sum(x[:4] ** 2) < 1e-3 * np.sum(xo ** 2)
