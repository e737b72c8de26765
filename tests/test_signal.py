"""Signal utilities (ref: tests/test_signal.py)."""

import json

import numpy as np

from flowcontrol_tpu.utils.signal import (
    MultisineGenerator,
    MyEncoder,
    NoIndent,
    compute_signal_frequency,
    crest_factor,
    multisine,
    multisine_MP,
    pad_upto,
    sample_lco,
    saturate,
)


def test_compute_signal_frequency():
    dt, Tf = 0.01, 20.0
    t = np.arange(0, Tf, dt)
    sig = np.sin(2 * np.pi * 1.7 * t) + 0.3
    f = compute_signal_frequency(sig, Tf, dt)
    assert abs(f - 1.7) < 0.02


def test_sample_lco():
    ts = sample_lco(Tlco=2.0, Tstartlco=10.0, nsim=4)
    assert np.allclose(ts, [10.0, 10.5, 11.0, 11.5])


def test_pad_saturate():
    assert pad_upto([1, 2], 4) == [1, 2, 0, 0]
    assert np.allclose(pad_upto(np.array([1.0, 2.0]), 4, v=9), [1, 2, 9, 9])
    assert saturate(5, 0, 1) == 1
    assert saturate(-5, 0, 1) == 0
    assert saturate(0.5, 0, 1) == 0.5


def test_multisine_flat_spectrum():
    rng = np.random.default_rng(0)
    N, Fs = 256, 10.0
    y = multisine(N, Fs, fmin=0.1, fmax=0.5, rng=rng)
    assert y.shape == (N,)
    # spectrum flat within the band, (near) zero outside
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(N, d=1 / Fs) * N / (N - 1)  # grid matching
    band = (freqs >= 0.1 * Fs / 2 - 0.05) & (freqs <= 0.5 * Fs / 2 + 0.05)
    assert spec[band].mean() > 10 * spec[~band].mean()


def test_multisine_crest_optimization():
    rng = np.random.default_rng(1)
    y0 = multisine(128, 1.0, 0.0, 1.0, rng=np.random.default_rng(1))
    y1 = multisine(128, 1.0, 0.0, 1.0, opt_cf=20, rng=np.random.default_rng(1))
    assert crest_factor(y1) <= crest_factor(y0) + 1e-12


def test_multisine_mp_shapes():
    y = multisine_MP(3, 2, unwrap=False, N=64, Fs=1.0, fmin=0.0, fmax=1.0,
                     rng=np.random.default_rng(0))
    assert y.shape == (3, 128)
    # periods tile exactly
    assert np.allclose(y[:, :64], y[:, 64:])
    flat = multisine_MP(3, 2, unwrap=True, N=64, Fs=1.0, fmin=0.0, fmax=1.0,
                        rng=np.random.default_rng(0))
    assert flat.shape == (384,)


def test_multisine_generator_matches_periodicity():
    gen = MultisineGenerator(N=64, Fs=8.0, fmin=0.1, fmax=0.9,
                             rng=np.random.default_rng(2))
    t = np.linspace(0, 4.0, 50)
    v1 = gen.generate(t)
    v2 = gen.generate(t + 8.0)  # period = N/Fs = 8
    assert np.allclose(v1, v2, atol=1e-9)


def test_multisine_generator_harmonics():
    f = MultisineGenerator.compute_harmonics(0.5, 10, Fs=4.0, fmin=0.0, fmax=1.0)
    assert (f <= 2.0).all()
    assert np.allclose(np.diff(f), 0.5)


def test_json_noindent():
    payload = {"a": NoIndent([1, 2, 3]), "b": {"c": 4}}
    s = json.dumps(payload, cls=MyEncoder, indent=2)
    assert "[1, 2, 3]" in s
    d = json.loads(s)
    assert d["a"] == [1, 2, 3]
