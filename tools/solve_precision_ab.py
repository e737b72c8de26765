"""On-chip A/B: multifrontal solve accuracy/time vs panel width and
matmul precision, plus the banded mass apply, at stock 56k scale.

Motivation: single-RHS einsums lower to exact-f32 VPU matvecs, but the
solve_panel trick reshapes them into matmuls that land on the MXU at
DEFAULT precision = bf16 operands (~2^-9 relative per contraction).
This quantifies the panel's real speed/accuracy trade so the production
default can pin the right precision.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp

O1 = "/root/reference/src/examples/cylinder/data_input/O1.xdmf"


def timed_scan(fn, tree, x, reps=50):
    # tree rides as a jit argument: closing over GB-scale device arrays
    # bakes them into the remote-compile request (HTTP 413 on the tunnel)
    def body(c, _, tr):
        y = fn(tr, c)
        if y.ndim > c.ndim:  # panel legs: fold back to lane 0
            y = y[0]
        c2 = jax.lax.optimization_barrier(c + 0.0 * y[..., : c.shape[-1]])
        return c2, ()

    @jax.jit
    def run(tr, x0):
        return jax.lax.scan(
            lambda c, s: body(c, s, tr), x0, None, length=reps
        )[0]

    jax.block_until_ready(run(tree, x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(tree, x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import scipy.sparse.linalg as spla

    from flowcontrol_tpu.fem.assembly import to_scipy_csr
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver
    from flowcontrol_tpu.parallel.dofsharding import mixed_dof_coordinates
    from flowcontrol_tpu.solvers.multifrontal import (
        MultifrontalLU,
        multifrontal_solve,
    )

    fs = CylinderFlowSolver.make_default(
        Re=100, meshpath=O1, num_steps=1, save_every=0,
        path_out=Path("/tmp/solve_ab"), verbose=0,
        solver_backend="host_lu", precision="f32",
    )
    base = (Path(__file__).resolve().parents[1] /
            "flowcontrol_tpu/models/_baseflows" /
            f"cylinder_re100_n{fs.space.n_dofs}.npz")
    d = np.load(base)
    fs._assign_steady_state(d["U0"], d["P0"])
    bcs = fs._bcset_perturbation()
    lhs_e = fs.forms.transient_lhs(2, fs.fields.U0)
    a_csr = to_scipy_csr(lhs_e, fs.space.cell_dofs, fs.space.n_dofs)
    a_bc, _ = bcs.eliminate_csr(a_csr)
    coords = mixed_dof_coordinates(fs.space)
    n = a_bc.shape[0]
    print(f"device={jax.devices()[0].device_kind} n={n}", flush=True)

    mf = MultifrontalLU(a_bc, coords, dtype=jnp.float32)
    tree, st = jax.device_put(mf.tree()), mf.static()

    rng = np.random.default_rng(0)
    b64 = rng.standard_normal(n)
    x_ref = spla.splu(a_bc.tocsc()).solve(b64)
    nrm = np.linalg.norm(x_ref)
    b32 = jnp.asarray(b64, dtype=jnp.float32)

    def leg(name, fn2):
        # tree is a jit ARGUMENT (closing over the 0.5 GB factor stack
        # bakes it into the remote-compile request -> HTTP 413)
        x = np.asarray(jax.jit(fn2)(tree, b32), dtype=np.float64)
        if x.ndim == 2:
            lanes_eq = bool(np.all(x == x[0:1]))
            x = x[0]
        else:
            lanes_eq = True
        rel = np.linalg.norm(x - x_ref) / nrm
        t = timed_scan(fn2, tree, b32)
        print(f"{name:32s} {t:7.3f} ms  rel_err {rel:.3e}"
              f"{'' if lanes_eq else '  LANES DIFFER'}", flush=True)

    def solve1(tr, b):
        return multifrontal_solve(tr, b, **st)

    def solve_p(tr, b, p=8):
        bp = jnp.broadcast_to(b, (p,) + b.shape)
        return multifrontal_solve(tr, bp, **st)

    leg("solve panel=0 [default]", solve1)
    for prec in ("high", "highest"):
        def f(tr, b, p=prec):
            with jax.default_matmul_precision(p):
                return solve1(tr, b)
        leg(f"solve panel=0 [{prec}]", f)
    leg("solve panel=8 [default]", solve_p)
    for prec in ("high", "highest"):
        def f(tr, b, p=prec):
            with jax.default_matmul_precision(p):
                return solve_p(tr, b)
        leg(f"solve panel=8 [{prec}]", f)

    # banded mass apply accuracy (vs host f64 CSR matvec)
    from flowcontrol_tpu.ops.banded import banded_matvec, build_banded

    m_e = fs.forms.mass_elements()
    m_csr = to_scipy_csr(m_e, fs.space.cell_dofs, fs.space.n_dofs)
    m_bc, _ = bcs.eliminate_csr(m_csr)
    btree = build_banded(m_bc, dtype=np.float32)
    if btree is not None:
        btree = jax.device_put(btree)
        u64 = rng.standard_normal(n)
        y_ref = m_bc @ u64
        u32 = jnp.asarray(u64, dtype=jnp.float32)
        # ops/banded.py pins HIGH per-einsum now; measure as-shipped
        yt = np.asarray(
            jax.jit(banded_matvec)(btree, u32), dtype=np.float64
        )
        rel = np.linalg.norm(yt - y_ref) / np.linalg.norm(y_ref)
        t = timed_scan(banded_matvec, btree, u32)
        print(f"{'banded m-apply [pinned HIGH]':32s} {t:7.3f} ms  "
              f"rel_err {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
