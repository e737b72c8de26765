"""Global stability analysis: shift-invert eigenvalues of (A, E).

Mirrors ref: src/examples/operators/compute_eigenvalues.py. Expected
(reference domain/mesh): cylinder Re=100 unstable eigenvalue
0.132643 + 0.770015j (ref :50-51); this framework reproduces
0.13292 + 0.77003j on its own default mesh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert
from flowcontrol_tpu.utils.io import export_complex_field

cwd = Path(__file__).parent


def main(full_mesh=False):
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    mesh_kwargs = (
        {} if full_mesh
        else dict(yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8,
                  segments=80)
    )
    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=1, verbose=0, mesh_kwargs=mesh_kwargs,
        path_out=cwd / "data_output_eig",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="newton",
                            initial_guess=fs.fields.UP0)
    og = OperatorGetter(fs)
    a = og.get_A(autodiff=False)
    e = og.get_mass_matrix()
    vals, vecs = get_mat_vp_shift_invert(a, e, n=8, sigma=0.1 + 0.8j)
    print("leading eigenvalues:")
    for v in vals:
        print(f"  {v.real:+.6f} {v.imag:+.6f}j")
    export_complex_field(
        cwd / "data_output_eig" / "modes.h5", fs.space, vecs.T[:2],
        name="mode", frequencies=vals.imag[:2],
    )


if __name__ == "__main__":
    main()
