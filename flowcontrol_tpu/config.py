"""Global numerical configuration for flowcontrol_tpu.

Precision policy
----------------
Host-side setup (mesh, DOF maps, global sparse assembly, steady-state Newton)
always runs in float64 numpy/scipy: it is one-time work and accuracy matters.

Device-side hot loops (time stepping, batched rollouts) default to float32 on
TPU (native MXU/VPU precision) and float64 on CPU (where JAX x64 is cheap and
lets the test-suite validate bit-level physics). Override per-solver via the
``dtype`` arguments, or globally here.
"""

from __future__ import annotations

import os

import jax
import numpy as np

# Enable x64 so host-offloaded solves and CPU test runs are double precision.
# TPU kernels explicitly cast to float32 where performance matters.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: stepper/rollout programs at production
# sizes take tens of seconds to compile; warm restarts (restarted campaigns,
# repeated benchmarks) should pay that once per machine, not once per run.
_CACHE_DIR = os.environ.get(
    "FLOWCONTROL_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "flowcontrol_tpu", "xla"),
)
if _CACHE_DIR and _CACHE_DIR.lower() != "off":
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax or read-only home: cache is best-effort
        pass

#: numpy dtype used for all host-side (setup-time) arithmetic.
HOST_DTYPE = np.float64

#: integer dtype for DOF maps / connectivity on device.
INDEX_DTYPE = np.int32


def device_hbm_budget_bytes() -> int:
    """Usable HBM for resident solver state on the default device.

    Tries the runtime's memory stats; falls back to a measured-conservative
    default (the axon-tunneled v5e in this environment admits ~8.2 GB of
    single-buffer allocations even though v5e hardware has 16 GB). Override
    with FLOWCONTROL_TPU_HBM_GB.
    """
    env = os.environ.get("FLOWCONTROL_TPU_HBM_GB")
    if env:
        return int(float(env) * 1e9)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 0)
        if limit:
            return int(limit * 0.9)
    except Exception:
        pass
    return int(8.0e9)


def default_device_dtype():
    """float32 on TPU (fast path), float64 elsewhere (exactness path)."""
    if os.environ.get("FLOWCONTROL_TPU_FORCE_DTYPE") in ("f32", "float32"):
        return np.float32
    if os.environ.get("FLOWCONTROL_TPU_FORCE_DTYPE") in ("f64", "float64"):
        return np.float64
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return np.float32 if platform in ("tpu", "axon") else np.float64
