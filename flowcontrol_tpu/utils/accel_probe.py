"""Bounded accelerator-liveness probe, shared by bench.py and
__graft_entry__.py.

A relay-tunnel outage can hang ``jax.devices()`` forever, and a half-up
tunnel answers ``devices()`` instantly while every compile/execute RPC
blocks forever (observed 2026-08-20). Probing in-process cannot bound the
second mode; a subprocess can — and it keeps the caller's process free of
a poisoned backend. The child also reports WHICH platform executed the
tiny op, so a silent CPU fallback inside the child is distinguishable
from a live accelerator (a CPU pass would otherwise defeat the probe's
purpose).
"""

from __future__ import annotations

import subprocess
import sys
import time

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "v = float(jax.jit(lambda: (jnp.ones((128, 128))"
    " @ jnp.ones((128, 128))).sum())());"
    "print('PROBE_OK', jax.devices()[0].platform, v)"
)


def probe(timeout_s: float) -> tuple[str | None, str | None]:
    """Run a tiny jitted op end-to-end in a subprocess with a deadline.

    Returns ``(platform, None)`` when the op completed (platform is the
    child's executing backend, e.g. ``'tpu'``/``'axon'``/``'cpu'``), or
    ``(None, reason)`` when it did not.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None, (f"tiny-op probe timed out after {timeout_s:.0f}s — "
                      "TPU relay tunnel unreachable or wedged")
    except OSError as e:  # unusable sys.executable, fork failure, ...
        return None, f"tiny-op probe could not launch: {e}"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["no stderr"]
        return None, f"tiny-op probe failed: {tail[0]}"
    for line in (r.stdout or "").splitlines():
        if line.startswith("PROBE_OK"):
            return line.split()[1], None
    return None, "tiny-op probe printed no PROBE_OK line"


def probe_with_backoff(total_budget_s: float,
                       attempts: tuple[float, ...] = (60.0, 120.0, 300.0),
                       log=None) -> tuple[str | None, str | None]:
    """Retry the probe with growing per-attempt deadlines inside an overall
    budget — a wedged relay often recovers within minutes, and one long
    blocking attempt cannot tell 'down' from 'slow'. Returns like
    :func:`probe`."""
    t0 = time.time()
    reason = "no probe attempt made (zero budget)"
    for i, t in enumerate(attempts):
        left = total_budget_s - (time.time() - t0)
        if left <= 5:
            break
        plat, reason = probe(min(t, left))
        if plat is not None:
            return plat, None
        if log is not None:
            log(f"accel probe attempt {i + 1} failed ({reason}); "
                f"{total_budget_s - (time.time() - t0):.0f}s budget left")
    return None, reason
