"""A/B the multifrontal build-time error probe across orderings/knobs.

Builds MultifrontalLU for the stock cylinder (56k) or stock cavity (235k)
BDF2 matrix on host (CPU jax) under the current FC_MF_* environment and
prints the measured per-solve error (_measure_solve_err), padded/physical
factor bytes, and stage count — the calibration data for
MultifrontalLU.ZERO_SWEEP_ERR and for choosing default trim/leaf knobs.

Usage:  [FC_MF_TRIM=1] [FC_MF_LEAF_MAX=512] python tools/mf_err_ab.py [cavity]
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # host-only tool; never touch the chip

case = sys.argv[1] if len(sys.argv) > 1 else "cylinder"

if case == "cavity":
    from flowcontrol_tpu.models.cavity import CavityFlowSolver

    fs = CavityFlowSolver.make_default(
        Re=7500,
        meshpath=Path("/root/reference/src/examples/cavity/data_input/cavity_coarse.xdmf"),
        num_steps=10, save_every=0, path_out=Path("/tmp/mf_err_ab"),
        verbose=0, solver_backend="host_lu", precision="f64",
    )
else:
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    fs = CylinderFlowSolver.make_default(
        Re=100,
        meshpath=Path("/root/reference/src/examples/cylinder/data_input/O1.xdmf"),
        num_steps=10, save_every=0, path_out=Path("/tmp/mf_err_ab"),
        verbose=0, solver_backend="host_lu", precision="f64",
    )

base = Path(__file__).resolve().parents[1] / "flowcontrol_tpu/models/_baseflows"
art = {
    "cylinder": base / "cylinder_re100_n56203.npz",
    "cavity": base / "cavity_re7500_n235374.npz",
}[case]
d = np.load(art)
fs._assign_steady_state(d["U0"], d["P0"])

from flowcontrol_tpu.fem.assembly import to_scipy_csr
from flowcontrol_tpu.parallel.dofsharding import mixed_dof_coordinates
from flowcontrol_tpu.solvers.multifrontal import MultifrontalLU, _stage_phys_elems

bcs = fs._bcset_perturbation()
lhs_e = fs.forms.transient_lhs(2, fs.fields.U0)
a_bc, _ = bcs.eliminate_csr(
    to_scipy_csr(lhs_e, fs.space.cell_dofs, fs.space.n_dofs)
)

t0 = time.time()
slu = MultifrontalLU(
    a_bc, mixed_dof_coordinates(fs.space),
    leaf_max=int(os.environ.get("FC_MF_LEAF_MAX", "1536")),
    dtype=np.float32,
)
build_s = time.time() - t0
log_b = phys_b = 0
for st, (inv, ginv, fbi) in zip(slu._stage_static, [
        (s["inv"], s["ginv"], s["fbi"]) for s in slu._dev["stages"]]):
    log_b += inv.nbytes + ginv.nbytes + fbi.nbytes
    e, b, m = st[0], st[1], st[2]
    phys_b += _stage_phys_elems(m, e, b) * inv.dtype.itemsize
print(
    f"case={case} trim={os.environ.get('FC_MF_TRIM', '0')} "
    f"leaf={os.environ.get('FC_MF_LEAF_MAX', '1536')} "
    f"n={slu.n} stages={slu.n_depths} build={build_s:.0f}s\n"
    f"solve_err={slu.solve_err:.3e} recommended_refine={slu.recommended_refine}\n"
    f"factor bytes: logical={log_b / 2**30:.3f} GB physical={phys_b / 2**30:.3f} GB"
)
