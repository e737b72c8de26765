"""On-chip A/B of the nonlinear-convection N(u) variants at stock scale.

Measures, on the real device, for each path:
  - in-loop time (scan protocol, output threaded through the carry)
  - accuracy vs the host f64 gather-path reference

Variants: device scatter-add, windowed 'take', windowed 'onehot' at
DEFAULT / HIGH / HIGHEST matmul precision. The onehot pick is two extra
matmuls; at DEFAULT precision the MXU truncates the picked values to
bf16 (~2^-9 relative), which is visible in the stock-mesh trajectory —
this script quantifies the accuracy/speed trade to choose the
production default.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"


def timed_scan(fn, x, reps=100):
    """In-loop time: thread the output back through the carry so XLA
    cannot hoist or dead-code the body (same protocol as profile_step)."""

    def body(c, _):
        y = fn(c)
        c2 = jax.lax.optimization_barrier(c + 0.0 * y)
        return c2, ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=reps)[0])
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
    from flowcontrol_tpu.fem.assembly import nonlinear_convection
    from flowcontrol_tpu.ops.cellwindows import (
        build_cell_windows,
        nonlinear_convection_windowed,
    )

    fs = CylinderFlowSolver.make_default(
        Re=100, meshpath=O1, num_steps=1, save_every=0,
        path_out=Path("/tmp/nl_ab"), verbose=0,
        solver_backend="host_lu", precision="f32",
    )
    space = fs.space
    geom = fs.forms.geom
    n = space.n_dofs
    print(f"device={jax.devices()[0].device_kind} n_dofs={n}", flush=True)

    rng = np.random.default_rng(0)
    u64 = rng.standard_normal(n)
    u32 = jnp.asarray(u64, dtype=jnp.float32)

    # host f64 truth through the plain scatter-add path
    gd64 = {k: np.asarray(getattr(geom, k), dtype=np.float64)
            for k in ("wq", "phi2", "dphi2")}
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        ref = np.asarray(
            nonlinear_convection(
                gd64, space, jax.device_put(u64, cpu)
            ),
            dtype=np.float64,
        )
    nrm = np.linalg.norm(ref)

    gd32 = {k: jnp.asarray(np.asarray(getattr(geom, k)), dtype=jnp.float32)
            for k in ("wq", "phi2", "dphi2")}

    legs = {}

    def add_leg(name, fn):
        y = np.asarray(jax.jit(fn)(u32), dtype=np.float64)
        rel = np.linalg.norm(y - ref) / nrm
        t = timed_scan(fn, u32)
        legs[name] = (t, rel)
        print(f"{name:28s} {t:7.3f} ms   rel_err {rel:.3e}", flush=True)

    add_leg("scatter-add", lambda u: nonlinear_convection(gd32, space, u))

    gt = {"wq": geom.wq, "dphi2": geom.dphi2, "phi2": geom.phi2}
    for variant in ("take", "onehot"):
        built = build_cell_windows(
            space.cell_vel_nodes, space.n_vnodes, gt, dtype=np.float32
        )
        if built is None:
            print(f"windowed {variant}: build declined"); continue
        tree, static = built
        static["variant"] = variant
        tree = jax.device_put(tree)
        for prec in ((None,) if variant == "take"
                     else ("default", "high", "highest")):
            name = f"windowed {variant}" + (f" [{prec}]" if prec else "")
            if prec in (None, "default"):
                fn = lambda u, tr=tree, st=dict(static): (
                    nonlinear_convection_windowed(tr, st, u, n)
                )
            else:
                def fn(u, tr=tree, st=dict(static), p=prec):
                    with jax.default_matmul_precision(p):
                        return nonlinear_convection_windowed(tr, st, u, n)
            add_leg(name, fn)

    print("\nsummary (ms, rel_err):")
    for k, (t, r) in legs.items():
        print(f"  {k:28s} {t:7.3f}  {r:.3e}")


if __name__ == "__main__":
    main()
