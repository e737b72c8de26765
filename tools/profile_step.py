"""Component-level timing of the single-stream step on the stock O1 mesh.

Times, per executed iteration on the accelerator (batch=1):
  - full step        (the production step_fn, scanned)
  - solve only       (the multifrontal direct solve)
  - rhs only         (mass/lvel element applies + lifting)
  - nl only          (the nonlinear convection quadrature kernel)
  - m-apply only     (one mass element apply)
so the single-stream latency budget (VERDICT r2 item 3) is attributable,
not guessed. Ref hot loop being matched:
/root/reference/src/flowcontrol/flowsolver.py:703-799.
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
import os as _os

REPS = int(_os.environ.get("FC_PROFILE_REPS", "50"))


def timed(fn, *args, reps=None):
    reps = REPS if reps is None else reps
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def _solve_microbench(st, oi):
    """Inside-the-solve attribution: time the factor einsums ALONE at the
    real stage shapes, so 'solve is slow' separates into 'the batched
    matvec lowering is slow' vs 'the graph around it is slow'. Also times
    a B=8 multi-RHS solve — if agg B=8 costs ~the same as B=1, the
    single-RHS matvec is leaving most of the factor-read bandwidth unused
    and a multi-RHS-shaped lowering (or pre-transposed stacks) is the fix."""
    tree = st._dev["solvers"][oi]
    if not isinstance(tree, dict) or "stages" not in tree:
        print("  (solve microbench: not a multifrontal solver — skipped)")
        return
    stages = tree["stages"]
    ji = "inv_t" in stages[0]
    ik, gk, fk = ("inv_t", "ginv_t", "fbi_t") if ji else ("inv", "ginv", "fbi")
    fwd_bytes = sum(s[ik].nbytes + s[fk].nbytes for s in stages)
    bwd_bytes = sum(s[gk].nbytes for s in stages)

    def fwd_einsums(stgs, x_parts):
        outs = []
        for s, xe in zip(stgs, x_parts):
            if ji:
                z = jnp.einsum("mji,...mj->...mi", s[ik], xe)
                outs.append(jnp.einsum("mib,...mi->...mb", s[fk], z))
            else:
                z = jnp.einsum("mij,...mj->...mi", s[ik], xe)
                outs.append(jnp.einsum("mbi,...mi->...mb", s[fk], z))
        return outs

    xs = [
        jnp.zeros((s[ik].shape[0], s[ik].shape[1]), dtype=s[ik].dtype)
        for s in stages
    ]
    f = jax.jit(lambda xp: fwd_einsums(stages, xp))
    t_ein = timed(lambda: f(xs))
    gbs = (fwd_bytes / 1e9) / (t_ein / 1e3)
    print(f"  fwd factor einsums alone: {t_ein:7.3f} ms "
          f"({fwd_bytes / 2**30:.2f} GB -> {gbs:.0f} GB/s)")

    # same einsums with an 8-wide RHS panel: bytes identical, flops x8
    xs8 = [jnp.zeros((8,) + x.shape, dtype=x.dtype) for x in xs]
    f8 = jax.jit(lambda xp: fwd_einsums(stages, xp))
    t_ein8 = timed(lambda: f8(xs8))
    print(f"  fwd einsums, 8-RHS panel: {t_ein8:7.3f} ms "
          f"(x{t_ein8 / t_ein:.2f} vs 1-RHS; bytes equal)")

    if not ji:
        # hand-scheduled streaming matvec on the SAME stacks — the direct
        # bandwidth A/B for FC_MF_EINSUM=pallas (skips misaligned stages)
        from flowcontrol_tpu.ops.pallas_mf_matvec import stack_matvec

        ok = [s for s, x in zip(stages, xs)
              if s[ik].shape[1] % 128 == 0 and s[fk].shape[1] % 128 == 0]
        okx = [x for s, x in zip(stages, xs)
               if s[ik].shape[1] % 128 == 0 and s[fk].shape[1] % 128 == 0]
        pb = sum(s[ik].nbytes + s[fk].nbytes for s in ok)

        def fwd_pallas(stgs, x_parts):
            outs = []
            for s, xe in zip(stgs, x_parts):
                z = stack_matvec(s[ik], xe)
                outs.append(stack_matvec(s[fk], z))
            return outs

        fp = jax.jit(lambda xp: fwd_pallas(ok, xp))
        t_pl = timed(lambda: fp(okx))
        gbs_pl = (pb / 1e9) / (t_pl / 1e3)
        print(f"  fwd pallas stack_matvec:  {t_pl:7.3f} ms "
              f"({pb / 2**30:.2f} GB -> {gbs_pl:.0f} GB/s, "
              f"{len(ok)}/{len(stages)} stages aligned)")
    print(f"  factor bytes fwd/bwd: {fwd_bytes / 2**30:.2f} / "
          f"{bwd_bytes / 2**30:.2f} GB, {len(stages)} stages")


def main():
    import os

    # experiment knobs: FC_WINDOWED_NL=onehot|take, FC_BANDED=0|1,
    # FC_PROFILE_MESH=cavity (235k stock cavity instead of the O1 cylinder)
    opts = {}
    if os.environ.get("FC_WINDOWED_NL"):
        opts["windowed_nl"] = os.environ["FC_WINDOWED_NL"]
    if os.environ.get("FC_BANDED"):
        opts["banded_operators"] = os.environ["FC_BANDED"] == "1"
    if os.environ.get("FC_FACTOR_DTYPE"):
        opts["factor_dtype"] = os.environ["FC_FACTOR_DTYPE"]
    if os.environ.get("FC_REFINE"):
        opts["refine_steps"] = int(os.environ["FC_REFINE"])
    baseflows = Path(__file__).resolve().parents[1] / \
        "flowcontrol_tpu/models/_baseflows"
    if os.environ.get("FC_PROFILE_MESH") == "cavity":
        from flowcontrol_tpu.models.cavity import CavityFlowSolver

        fs = CavityFlowSolver.make_default(
            Re=7500,
            meshpath=Path("/root/reference/src/examples/cavity/data_input/"
                          "cavity_coarse.xdmf"),
            num_steps=10, save_every=0, path_out=Path("/tmp/profile_step"),
            verbose=10, solver_backend="dense_lu", precision="f32",
            stepper_options=opts,
        )
        d = np.load(baseflows / f"cavity_re7500_n{fs.space.n_dofs}.npz")
        fs._assign_steady_state(d["U0"], d["P0"])
    else:
        fs = CylinderFlowSolver.make_default(
            Re=100, meshpath=O1, num_steps=10, save_every=0,
            path_out=Path("/tmp/profile_step"), verbose=10,
            solver_backend="dense_lu", precision="f32",
            stepper_options=opts,
        )
        base = baseflows / f"cylinder_re100_n{fs.space.n_dofs}.npz"
        if base.exists():
            d = np.load(base)
            fs._assign_steady_state(d["U0"], d["P0"])
        else:
            fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard",
                                    max_iter=2)
    fs.initialize_time_stepping()
    st = fs.stepper  # lazily prepares systems + carry
    dev = st._dev
    n = st.space.n_dofs

    carry = fs._carry
    u_ctrl = jnp.zeros((st.n_act,), dtype=st.dtype)

    step = jax.jit(st.step_fn())
    t_step = timed(lambda: step(dev, carry, u_ctrl)[0].u_n)

    rhs_f = jax.jit(lambda d, c, u, nl: st._rhs(d, 2, c, u, nl))
    nl_f = jax.jit(lambda d, x: st._nl(d, x))
    nl0 = nl_f(dev, carry.u_n)
    t_nl = timed(lambda: nl_f(dev, carry.u_n))
    t_rhs = timed(lambda: rhs_f(dev, carry, u_ctrl, nl0))

    rhs0 = rhs_f(dev, carry, u_ctrl, nl0)
    oi = len(st._solver_kinds) - 1
    solve_f = jax.jit(lambda d, b: st._dense_solve_once(d, oi, b))
    t_solve = timed(lambda: solve_f(dev, rhs0))
    rhs8 = jnp.broadcast_to(rhs0, (8,) + rhs0.shape)
    t_solve8 = timed(lambda: solve_f(dev, rhs8))

    m_f = jax.jit(lambda d, x: st._apply(d, "m", x))
    t_m = timed(lambda: m_f(dev, carry.u_n))
    try:
        lvel_f = jax.jit(lambda d, x: st._apply(d, "lvel", x))
        t_lvel = timed(lambda: lvel_f(dev, carry.u_n))
    except Exception:
        t_lvel = float("nan")

    try:
        resid_f = jax.jit(lambda d, b, x: st._residual(d, oi, b, x))
        x0 = solve_f(dev, rhs0)
        t_res = timed(lambda: resid_f(dev, rhs0, x0))
    except Exception:
        t_res = float("nan")

    print(f"n_dofs={n}  platform={jax.devices()[0].platform}")
    print(f"full step : {t_step:7.3f} ms  ({1e3 / t_step:6.1f} steps/s)")
    print(f"  solve   : {t_solve:7.3f} ms  (B=8: {t_solve8:7.3f} ms, "
          f"x{t_solve8 / t_solve:.2f})")
    _solve_microbench(st, oi)
    print(f"  rhs     : {t_rhs:7.3f} ms")
    print(f"  nl conv : {t_nl:7.3f} ms")
    print(f"  m apply : {t_m:7.3f} ms")
    print(f"  lvel    : {t_lvel:7.3f} ms")
    print(f"  residual: {t_res:7.3f} ms")
    acc = t_solve + t_rhs + t_nl
    print(f"  sum(solve+rhs+nl) = {acc:.3f} ms; step - sum = "
          f"{t_step - acc:.3f} ms (sensors, carry, dispatch)")


if __name__ == "__main__":
    main()
