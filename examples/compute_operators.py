"""Export A, E, B, C operators for all benchmark flows.

Mirrors ref: src/examples/operators/compute_operators.py:15-27.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.io import export_square_operators

cwd = Path(__file__).parent


def compute_and_export(fs, name):
    og = OperatorGetter(fs)
    a, e, b, c = og.get_all(autodiff=False)
    out = cwd / "data_output_operators" / name
    export_square_operators(out, {"A": a, "E": e})
    np.savez_compressed(str(out) + "_BC.npz", B=b, C=c)
    print(f"{name}: A nnz={a.nnz}, B {b.shape}, C {c.shape}")
    return a, e, b, c


def main():
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=1, verbose=0,
        mesh_kwargs=dict(yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0,
                         n3=0.8, segments=80),
        path_out=cwd / "data_output_operators",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="newton",
                            initial_guess=fs.fields.UP0)
    compute_and_export(fs, "cylinder")


if __name__ == "__main__":
    main()
