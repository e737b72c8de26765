"""A/B the multifrontal DP stage-packing penalty (FC_MF_PACK_LAM_MB) on-chip.

The penalty prices one stage's fixed overhead; the measured per-stage cost
of the single-stream concat sweep (~70 us of gather/concat/dispatch at the
stock 56k mesh) is far above the 8-MB default's ~10 us HBM-equivalent, so
higher lam should trade padded bytes for fewer stages and win single-stream
— while the batched (threaded) sweep pays the padded FLOPs and should
prefer low lam. This tool measures BOTH modes for one lam value (set via
env) using the scan-protocol timer from tools/profile_step (classic
warmup+block timing is meaningless on the axon relay platform).

Usage:  FC_MF_PACK_LAM_MB=64 python tools/lam_ab.py [batch]
Prints: one line  `lam=<v> stages=<k> single_ms=<t1> batched_ms=<tB> ...`
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from profile_step import timed, _null_overhead_s  # noqa: E402
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver  # noqa: E402

O1 = Path("/root/reference/src/examples/cylinder/data_input/O1.xdmf")
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    lam = os.environ.get("FC_MF_PACK_LAM_MB", "8")
    baseflows = (Path(__file__).resolve().parents[1]
                 / "flowcontrol_tpu/models/_baseflows")
    mesh = os.environ.get("FC_PROFILE_MESH", "cylinder")
    if mesh == "cavity":
        from flowcontrol_tpu.models.cavity import CavityFlowSolver

        fs = CavityFlowSolver.make_default(
            Re=7500,
            meshpath=Path("/root/reference/src/examples/cavity/data_input/"
                          "cavity_coarse.xdmf"),
            num_steps=10, save_every=0, path_out=Path("/tmp/lam_ab"),
            verbose=0, solver_backend="dense_lu", precision="f32",
        )
        d = np.load(baseflows / f"cavity_re7500_n{fs.space.n_dofs}.npz")
    else:
        fs = CylinderFlowSolver.make_default(
            Re=100, meshpath=O1, num_steps=10, save_every=0,
            path_out=Path("/tmp/lam_ab"), verbose=0,
            solver_backend="dense_lu", precision="f32",
        )
        d = np.load(baseflows / f"cylinder_re100_n{fs.space.n_dofs}.npz")
    fs._assign_steady_state(d["U0"], d["P0"])
    fs.initialize_time_stepping()
    t0 = time.time()
    st = fs.stepper
    prep_s = time.time() - t0
    dev = st._dev
    oi = st._order_idx.get(2, 0)
    tree = dev["solvers"][oi]
    n_stages = len(st._schur_static[oi]["stages"])
    fbytes = sum(
        v.nbytes for s in tree["stages"]
        for k, v in s.items() if k in ("inv", "ginv", "fbi",
                                       "inv_t", "ginv_t", "fbi_t")
    )

    carry1 = fs._carry._replace(it=jnp.asarray(1, dtype=jnp.int32))
    u_ctrl = jnp.zeros((st.n_act,), dtype=st.dtype)
    step_fn = st.step_fn()
    t_single = timed(lambda d_, c: step_fn(d_, c, u_ctrl), dev, carry1)

    t_batched = float("nan")
    if BATCH:
        up_b = np.asarray(st.from_hot(fs._carry.u_n))[None, :].repeat(BATCH, 0)
        carry_b = st.init_carry(jnp.asarray(up_b, dtype=st.dtype))
        carry_b = carry_b._replace(it=jnp.asarray(1, dtype=jnp.int32))
        u_b = jnp.zeros((BATCH, st.n_act), dtype=st.dtype)
        reps_b = int(os.environ.get("FC_LAM_AB_BREPS", "20"))
        t_batched = timed(lambda d_, c: step_fn(d_, c, u_b), dev, carry_b,
                          reps=reps_b)

    print(
        f"lam={lam} stages={n_stages} factor_GB={fbytes / 2**30:.2f} "
        f"single_ms={t_single:.3f} ({1e3 / t_single:.1f}/s) "
        f"batched_ms={t_batched:.3f} "
        f"(agg {BATCH * 1e3 / t_batched:.0f}/s, B={BATCH}) "
        f"prep_s={prep_s:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
