"""Stock cavity (Re=7500, dt=4e-4, 235k dofs) through the TPU production
path — the reference's stiffest flagship, solved there by MUMPS without
ceremony (ref: src/flowcontrol/flowsolver.py:812-814, cavity config
cavityflowsolver.py:254-268). Here: nested-dissection batched multifrontal
(solvers/multifrontal.py) with f64 host factors rounded to f32.

Prints prepare time, single-stream and batched throughput, a same-host
splu baseline, and 10-step sensor parity vs the host_lu/f64 path.

Usage: python tools/stock_cavity_tpu.py  (TPU; ~10 min cold)
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

MESH = "/root/reference/src/examples/cavity/data_input/cavity_coarse.xdmf"
OUT = Path("/tmp/stock_cavity")
STEPS = int(os.environ.get("CAVITY_STEPS", "100"))
BATCH = int(os.environ.get("CAVITY_BATCH", "16"))


def build(backend, precision):
    from flowcontrol_tpu.models.cavity import CavityFlowSolver

    fs = CavityFlowSolver.make_default(
        Re=7500, meshpath=MESH, num_steps=max(STEPS, 10), save_every=0,
        path_out=OUT, verbose=0, solver_backend=backend, precision=precision,
    )
    base = (Path(__file__).resolve().parents[1] / "flowcontrol_tpu" / "models"
            / "_baseflows" / f"cavity_re7500_n{fs.space.n_dofs}.npz")
    if base.exists():
        # committed artifact (interior steady residual 3e-12)
        d = np.load(base)
        fs._assign_steady_state(d["U0"], d["P0"])
    else:
        fs.load_steady_state()  # /tmp checkpoint (tools/stock_cavity_parity.py)
    return fs


def parity32_main():
    """Subprocess leg: 10 production-path f32 steps, results to npz."""
    fs = build("dense_lu", "f32")
    fs.initialize_time_stepping()
    for _ in range(10):
        y = fs.step(u_ctrl=np.zeros(fs.params_control.actuator_number))
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez(OUT / "parity32.npz", y=np.asarray(y),
             up=np.asarray(fs.fields.up_))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("CAVITY_MODE") == "parity32":
        parity32_main()
        return

    print(f"# platform: {jax.devices()[0].platform}", flush=True)

    fs = build("dense_lu", "f32")
    print(f"# n_dofs={fs.space.n_dofs}", flush=True)

    t0 = time.time()
    fs.initialize_time_stepping()
    fs.order = 2
    fs._prepare_systems()
    fs.first_step = False
    prepare_s = time.time() - t0
    print(f"# prepare (factor+upload): {prepare_s:.0f}s", flush=True)

    st = fs._stepper
    carry = fs._carry
    roll = st.make_rollout_open_loop()
    u_seq = np.zeros((STEPS, st.n_act), dtype=st.dtype)

    t0 = time.time()
    _, outs = roll(carry, u_seq)
    y = np.asarray(outs.y)
    compile_s = time.time() - t0
    t0 = time.time()
    _, outs = roll(carry, u_seq)
    y = np.asarray(outs.y)
    single = STEPS / (time.time() - t0)
    assert np.isfinite(np.asarray(outs.dE)).all(), "diverged"
    print(f"# compile {compile_s:.0f}s; single-stream {single:.1f} steps/s",
          flush=True)

    # batched leg
    batched = None
    try:
        up_b = np.asarray(st.from_hot(carry.u_n))[None, :].repeat(BATCH, 0)
        carry_b = st.init_carry(jnp.asarray(up_b, dtype=st.dtype))
        useq_b = np.zeros((STEPS, BATCH, st.n_act), dtype=st.dtype)
        _, outs_b = roll(carry_b, useq_b)
        _ = np.asarray(outs_b.y)
        t0 = time.time()
        _, outs_b = roll(carry_b, useq_b)
        _ = np.asarray(outs_b.y)
        batched = STEPS * BATCH / (time.time() - t0)
        print(f"# batched B={BATCH}: {batched:.0f} agg steps/s", flush=True)
    except Exception as e:
        print(f"# batched leg failed: {e}", flush=True)

    # parity: 10 steps vs host_lu/f64. The f32 leg runs in a SUBPROCESS:
    # the axon relay does not reclaim a client's HBM on buffer deletion,
    # so compiling a second dense_lu instance in-process OOMs (observed:
    # 25 G needed / 15.7 G available even after dropping every reference).
    # A fresh client starts from an empty chip.
    import subprocess

    env = dict(os.environ, CAVITY_MODE="parity32")
    rc = subprocess.run(
        [sys.executable, __file__], env=env, capture_output=True, text=True,
    )
    sys.stderr.write(rc.stderr[-2000:])
    if rc.returncode != 0:
        print(f"# parity f32 subprocess failed rc={rc.returncode}",
              flush=True)
        y32 = up32 = None
    else:
        d = np.load(OUT / "parity32.npz")
        y32, up32 = d["y"], d["up"]
    fs64 = build("host_lu", "f64")
    fs64.initialize_time_stepping()
    for _ in range(10):
        y64 = fs64.step(u_ctrl=np.zeros(fs64.params_control.actuator_number))
    if y32 is not None:
        dy = np.abs(y32 - np.asarray(y64)) / np.abs(np.asarray(y64))
        dx = np.linalg.norm(up32 - fs64.fields.up_) / np.linalg.norm(
            fs64.fields.up_
        )
        print(f"# 10-step parity vs host_lu/f64: y rel {dy.max():.2e}, "
              f"field rel {dx:.2e}", flush=True)

    # same-host CPU baseline: splu factor (one-time) + per-step backsolve
    import scipy.sparse.linalg as spla

    from flowcontrol_tpu.fem.assembly import (
        nonlinear_convection_np,
        to_scipy_csr,
    )

    bcs = fs64._bcset_perturbation()
    lhs_e = fs64.forms.transient_lhs(2, fs64.fields.U0)
    a_csr = to_scipy_csr(lhs_e, fs64.space.cell_dofs, fs64.space.n_dofs)
    a_bc, _ = bcs.eliminate_csr(a_csr)
    mass = to_scipy_csr(fs64.forms.mass_elements(), fs64.space.cell_dofs,
                        fs64.space.n_dofs)
    t0 = time.time()
    lu = spla.splu(a_bc.tocsc())
    print(f"# cpu splu factor: {time.time() - t0:.0f}s", flush=True)
    dt = fs64.params_time.dt
    rng = np.random.default_rng(0)
    u_n = 1e-3 * rng.standard_normal(fs64.space.n_dofs)
    u_nn = u_n.copy()
    t0 = time.time()
    cpu_steps = 5
    for _ in range(cpu_steps):
        rhs = (2.0 / dt) * (mass @ u_n) - (0.5 / dt) * (mass @ u_nn)
        rhs = rhs - 2.0 * nonlinear_convection_np(fs64.geom, fs64.space, u_n)
        rhs = rhs + nonlinear_convection_np(fs64.geom, fs64.space, u_nn)
        rhs[bcs.dofs] = 0.0
        x = lu.solve(rhs)
        u_nn, u_n = u_n, x
    cpu_sps = cpu_steps / (time.time() - t0)
    print(f"# cpu splu: {cpu_sps:.2f} steps/s -> tpu single {single:.1f} "
          f"({single / cpu_sps:.1f}x), batched {batched and round(batched)}",
          flush=True)


if __name__ == "__main__":
    main()
