"""Frequency response and eigensolvers vs analytic results
(ref: tests/test_linalg.py:1-31 — SISO TF cross-check)."""

import numpy as np
import scipy.sparse as sp

from flowcontrol_tpu.utils.linalg import (
    dense_to_sparse,
    eig_arnoldi_dense_tpu,
    get_field_response,
    get_frequency_response,
    get_frequency_response_tpu,
    get_mat_vp_shift_invert,
)


def siso_system():
    """dx = -x + u, y = 2x  →  H(jw) = 2/(jw + 1)."""
    a = sp.csr_matrix(np.array([[-1.0]]))
    q = sp.csr_matrix(np.eye(1))
    b = np.array([[1.0]])
    c = np.array([[2.0]])
    return a, b, c, q


def test_frequency_response_siso_analytic():
    a, b, c, q = siso_system()
    ww = np.array([0.0, 0.5, 1.0, 10.0])
    h = get_frequency_response(a, b, c, q, ww)
    h_ref = 2.0 / (1j * ww + 1.0)
    assert np.allclose(h[:, 0, 0], h_ref, rtol=1e-12)


def test_frequency_response_mimo_shapes():
    n = 6
    rng = np.random.default_rng(0)
    a = sp.csr_matrix(-np.eye(n) + 0.1 * rng.standard_normal((n, n)))
    q = sp.csr_matrix(np.eye(n))
    b = rng.standard_normal((n, 2))
    c = rng.standard_normal((3, n))
    ww = np.array([0.1, 1.0])
    h = get_frequency_response(a, b, c, q, ww)
    assert h.shape == (2, 3, 2)
    # cross-check one entry against a dense solve
    hd = c @ np.linalg.solve(1j * 0.1 * np.eye(n) - a.toarray(), b)
    assert np.allclose(h[0], hd)


def test_frequency_response_tpu_matches_host():
    n = 8
    rng = np.random.default_rng(1)
    a_d = -2 * np.eye(n) + 0.2 * rng.standard_normal((n, n))
    b = rng.standard_normal((n, 1))
    c = rng.standard_normal((1, n))
    q = np.eye(n)
    ww = np.array([0.2, 1.0, 3.0])
    h_host = get_frequency_response(sp.csr_matrix(a_d), b, c, sp.csr_matrix(q), ww)
    h_tpu = get_frequency_response_tpu(a_d, b, c, q, ww, dtype=np.complex64)
    assert np.allclose(h_tpu, h_host, rtol=2e-4, atol=1e-6)


def test_field_response():
    a, b, c, q = siso_system()
    x = get_field_response(a, b, q, [1.0])
    assert np.allclose(x[0, 0, 0], 1.0 / (1j + 1.0))


def test_shift_invert_eig_generalized():
    """A x = λ E x with singular E (mimics the pressure-singular mass)."""
    n = 30
    diag_a = np.concatenate([[1.0], -np.linspace(1, 8, n - 1)])
    a_d = np.diag(diag_a)
    rng = np.random.default_rng(0)
    a_d += 1e-3 * np.triu(rng.standard_normal((n, n)), 1)  # break degeneracy
    e_d = np.eye(n)
    e_d[-1, -1] = 0.0  # singular row (like the pressure block of E)
    a, e = sp.csr_matrix(a_d), sp.csr_matrix(e_d)
    vals, vecs = get_mat_vp_shift_invert(a, e, n=3, sigma=0.5)
    assert np.allclose(np.sort(vals.real), [-1.25, -1.0, 1.0], atol=1e-3)
    # residual check
    for k in range(3):
        r = a_d @ vecs[:, k] - vals[k] * (e_d @ vecs[:, k])
        assert np.abs(r).max() < 1e-8


def test_arnoldi_dense_tpu_matches_host():
    rng = np.random.default_rng(2)
    n = 30
    a_d = -np.diag(np.linspace(0.5, 5, n)) + 0.1 * rng.standard_normal((n, n))
    a_d[0, 0] = 0.3  # one unstable mode
    e_d = np.eye(n)
    vals_host = get_mat_vp_shift_invert(
        sp.csr_matrix(a_d), sp.csr_matrix(e_d), n=3, sigma=0.3,
        return_vectors=False,
    )
    vals_tpu, _ = eig_arnoldi_dense_tpu(a_d, e_d, n=3, sigma=0.3, n_krylov=25,
                                        dtype=np.complex64)
    assert abs(vals_tpu[0] - vals_host[0]) < 1e-2


def test_dense_to_sparse():
    m = dense_to_sparse(np.array([[1.0, 0.0], [0.0, 2.0]]))
    assert m.nnz == 2
