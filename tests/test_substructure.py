"""Substructured block-elimination solver vs sparse LU ground truth."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from flowcontrol_tpu.fem.assembly import to_scipy_csr
from flowcontrol_tpu.parallel.dofsharding import mixed_dof_coordinates
from flowcontrol_tpu.solvers.substructure import (
    SubstructuredLU,
    partition_dofs,
)


@pytest.fixture(scope="module")
def bdf2_system():
    """BDF2 time-step matrix of a small cylinder flow (BC-eliminated)."""
    from flowcontrol_tpu.mesh.generation import cylinder_mesh
    from flowcontrol_tpu.models.cylinder import CylinderFlowSolver

    mesh = cylinder_mesh(
        yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8, segments=80
    )
    fs = CylinderFlowSolver.make_default(
        Re=100, num_steps=1, verbose=0, mesh=mesh,
        solver_backend="host_lu", precision="f64",
    )
    fs.compute_steady_state(u_ctrl=[0.0, 0.0], method="picard", max_iter=3)
    bcs = fs._bcset_perturbation()
    lhs_e = fs.forms.transient_lhs(2, fs.fields.U0)
    a_csr = to_scipy_csr(lhs_e, fs.space.cell_dofs, fs.space.n_dofs)
    a_bc, _ = bcs.eliminate_csr(a_csr)
    return a_bc, mixed_dof_coordinates(fs.space)


def test_partition_blocks_decouple(bdf2_system):
    """Interior blocks must not couple across strips (A_II block-diagonal)."""
    a_bc, coords = bdf2_system
    interiors, iface = partition_dofs(a_bc, coords, 4)
    total = sum(len(i) for i in interiors) + len(iface)
    assert total == a_bc.shape[0]
    # interface should be a small fraction for a 1-D strip split
    assert len(iface) < 0.25 * a_bc.shape[0]
    for d in range(4):
        for e in range(d + 1, 4):
            block = a_bc[np.ix_(interiors[d], interiors[e])]
            assert block.nnz == 0


@pytest.mark.parametrize("n_blocks", [2, 4])
def test_substructured_solve_matches_splu(bdf2_system, n_blocks):
    import scipy.sparse.linalg as spla

    a_bc, coords = bdf2_system
    slu = SubstructuredLU(a_bc, coords, n_blocks=n_blocks, bs=256,
                          dtype=jax.numpy.float64)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a_bc.shape[0])
    x = np.asarray(slu.solve(b))
    x_ref = spla.splu(a_bc.tocsc()).solve(b)
    assert np.allclose(x, x_ref, rtol=1e-9, atol=1e-11)


def test_substructured_solve_batched(bdf2_system):
    import scipy.sparse.linalg as spla

    a_bc, coords = bdf2_system
    slu = SubstructuredLU(a_bc, coords, n_blocks=2, bs=256,
                          dtype=jax.numpy.float64)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((3, 5, a_bc.shape[0]))
    x = np.asarray(slu.solve(b))
    lu = spla.splu(a_bc.tocsc())
    for i in range(3):
        for j in range(5):
            assert np.allclose(x[i, j], lu.solve(b[i, j]), rtol=1e-9, atol=1e-11)
