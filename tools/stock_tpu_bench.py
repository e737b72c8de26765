"""Stock O1 mesh (56,203 dofs) on the real TPU through the production
dense_lu path (substructured block-elimination at this scale)."""
import sys, time
import logging
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"
t0 = time.time()
import os
stepper_options = {}
if os.environ.get("STOCK_FACTOR_DTYPE"):
    stepper_options["factor_dtype"] = os.environ["STOCK_FACTOR_DTYPE"]
if os.environ.get("STOCK_REFINE"):
    stepper_options["refine_steps"] = int(os.environ["STOCK_REFINE"])
if os.environ.get("STOCK_FACTOR_APPLY"):
    stepper_options["factor_apply"] = os.environ["STOCK_FACTOR_APPLY"]
fs = CylinderFlowSolver.make_default(
    Re=100, meshpath=O1, num_steps=50, save_every=0,
    path_out=Path("/tmp/stock_cl"), verbose=0,
    solver_backend="dense_lu", precision="f32",
    stepper_options=stepper_options,
)
base = Path(__file__).resolve().parents[1] / "flowcontrol_tpu/models/_baseflows" / f"cylinder_re100_n{fs.space.n_dofs}.npz"
if base.exists():
    d = np.load(base)
    fs._assign_steady_state(d["U0"], d["P0"])
else:
    fs.load_steady_state()
fs.initialize_time_stepping(ic=None)
print(f"init {time.time()-t0:.0f}s", flush=True)
t1 = time.time()
fs.order = 2  # single factorization (bench mode, like restart)
fs._prepare_systems()
fs.first_step = False
st = fs._stepper
print(f"prepare_systems (factor+compile): {time.time()-t1:.0f}s  kinds={st._solver_kinds}", flush=True)
try:
    ms = jax.devices()[0].memory_stats() or {}
    print("hbm:", {k: round(v/1e9, 2) for k, v in ms.items() if "bytes" in k and v > 1e8}, flush=True)
except Exception as e:
    print("hbm stats n/a", e, flush=True)

# correctness: a few steps vs the host f64 trajectory
print(f"t carry {time.time()-t0:.0f}s", flush=True)
carry = fs._carry
print(f"t carry done {time.time()-t0:.0f}s", flush=True)
step = st.compiled_step()
print(f"t compiled_step {time.time()-t0:.0f}s", flush=True)
t1 = time.time()
carry, out = step(carry, np.zeros(2, dtype=st.dtype))
jax.block_until_ready(out.y)
print(f"first step (compile): {time.time()-t1:.0f}s y={np.asarray(out.y)}", flush=True)

roll = st.make_rollout_open_loop()
useq = np.zeros((50, 2), dtype=st.dtype)
t1 = time.time()
c2, outs = roll(fs._carry, useq)
jax.block_until_ready(outs.y)
print(f"rollout compile+run: {time.time()-t1:.0f}s", flush=True)
t1 = time.time()
c2, outs = roll(fs._carry, useq)
jax.block_until_ready(outs.y)
single = 50/(time.time()-t1)
print(f"single-stream: {single:.1f} steps/s", flush=True)
print("y[last]:", np.asarray(outs.y)[-1], flush=True)
assert np.isfinite(np.asarray(outs.dE)).all()

# batched B=256
B = 256
up_b = np.asarray(fs._stepper.from_hot(fs._carry.u_n))[None, :].repeat(B, 0)
carry_b = st.init_carry(jnp.asarray(up_b, dtype=st.dtype))
useq_b = np.zeros((20, B, 2), dtype=st.dtype)
t1 = time.time()
_, outs_b = roll(carry_b, useq_b)
jax.block_until_ready(outs_b.y)
print(f"batched compile+run: {time.time()-t1:.0f}s", flush=True)
t1 = time.time()
_, outs_b = roll(carry_b, useq_b)
jax.block_until_ready(outs_b.y)
agg = 20*B/(time.time()-t1)
print(f"batched B={B}: {agg:.0f} agg steps/s", flush=True)
print(f"total {time.time()-t0:.0f}s", flush=True)
