"""Rollout-vs-step timing on the stock O1 mesh, replicating bench_tpu's setup.

The standalone jitted step measured 0.308 ms (~3250 steps/s) while bench.py's
scanned rollout reports ~51.5 steps/s (19.4 ms/step). This times the SAME
rollout at several lengths to locate the 60x gap (compile amortization?
scan-specific lowering? transfer?).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

O1 = Path("/root/reference/src/examples/cylinder/data_input/O1.xdmf")


def main():
    fs = CylinderFlowSolver.make_default(
        Re=100, meshpath=O1, num_steps=400, save_every=0,
        path_out=Path("/tmp/profile_roll"), verbose=10,
        solver_backend="dense_lu", precision="f32",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=2)
    fs.params_restart = None
    fs.initialize_time_stepping()
    fs.order = 2
    fs._prepare_systems()
    fs.first_step = False
    st = fs._stepper
    carry = fs._carry
    roll = st.make_rollout_open_loop()

    # standalone step in THIS config (start_order=2, no cond)
    step = jax.jit(st.step_fn())
    dev = st._dev
    u_ctrl = jnp.zeros((st.n_act,), dtype=st.dtype)
    out = step(dev, carry, u_ctrl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = carry
    for _ in range(100):
        c, o = step(dev, c, u_ctrl)
    jax.block_until_ready(c.u_n)
    t_step = (time.perf_counter() - t0) / 100 * 1e3
    print(f"standalone step (chained, 100x): {t_step:.3f} ms/step")

    for T in (50, 200, 400):
        u_seq = np.zeros((T, 2), dtype=st.dtype)
        t0 = time.perf_counter()
        _, outs = roll(carry, u_seq)
        _ = np.asarray(outs.y)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, outs = roll(carry, u_seq)
        _ = np.asarray(outs.y)
        dt = time.perf_counter() - t0
        print(f"T={T:4d}: first={t_compile:7.2f} s  warm={dt:7.3f} s  "
              f"{dt / T * 1e3:7.3f} ms/step  ({T / dt:8.1f} steps/s)")


if __name__ == "__main__":
    main()
