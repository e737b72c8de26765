"""Factor-cache format, round-trips, legacy compatibility, LRU eviction."""

import os

import numpy as np
import pytest

from flowcontrol_tpu.solvers import factor_cache as fc


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("FLOWCONTROL_TPU_FACTOR_CACHE", str(tmp_path))
    return tmp_path


def test_save_load_roundtrip(cache_env):
    arrays = {
        "n": np.int64(7),
        "depth_order": np.arange(4),
        "inv_0": np.random.default_rng(0).standard_normal((3, 5, 5)),
    }
    fc.save("deadbeef", **arrays)
    out = fc.load("deadbeef")
    assert out is not None
    assert int(out["n"]) == 7
    np.testing.assert_array_equal(out["depth_order"], arrays["depth_order"])
    np.testing.assert_allclose(out["inv_0"], arrays["inv_0"])
    # entry is a directory of raw .npy files (fast fread path, not zip)
    assert (cache_env / "deadbeef").is_dir()
    assert sorted(f.name for f in (cache_env / "deadbeef").glob("*.npy")) == [
        "depth_order.npy", "inv_0.npy", "n.npy",
    ]


def test_load_legacy_npz(cache_env):
    np.savez(cache_env / "cafe.npz", a=np.arange(3), n=np.int64(3))
    out = fc.load("cafe")
    assert out is not None and int(out["n"]) == 3
    np.testing.assert_array_equal(out["a"], np.arange(3))


def test_load_missing_returns_none(cache_env):
    assert fc.load("0000") is None


def test_corrupt_entry_is_a_miss(cache_env):
    d = cache_env / "bad"
    d.mkdir()
    (d / "x.npy").write_bytes(b"not a npy file")
    assert fc.load("bad") is None


def test_lru_eviction_caps_total_size(cache_env, monkeypatch):
    monkeypatch.setenv("FLOWCONTROL_TPU_FACTOR_CACHE_GB", "0.00002")  # ~21 KB
    big = np.zeros(2048)  # 16 KB each
    fc.save("old", x=big)
    os.utime(cache_env / "old", (1, 1))  # force oldest mtime
    fc.save("new", x=big)  # cap enforcement runs on save
    assert fc.load("new") is not None
    assert fc.load("old") is None  # evicted (dir removed)


def test_eviction_skips_inflight_tmp(cache_env, monkeypatch):
    monkeypatch.setenv("FLOWCONTROL_TPU_FACTOR_CACHE_GB", "0.00002")
    t = cache_env / "writer123.tmp"
    t.mkdir()
    (t / "x.npy").write_bytes(b"\x00" * 100_000)
    fc.save("entry", x=np.zeros(2048))
    assert t.exists()  # in-flight temp dirs are never evicted
    assert fc.load("entry") is not None
