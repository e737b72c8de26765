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


def test_substructured_solve_bf16_factor_with_refinement(bdf2_system):
    """bf16-ROUNDED factors (factorization still f64/f32) act as a
    preconditioner that contracts ~1.5e-2 per Richardson sweep; two sweeps
    reach the f32-factor accuracy class. This is the batched-throughput
    storage mode (Stepper factor_dtype='bf16')."""
    import scipy.sparse.linalg as spla

    a_bc, coords = bdf2_system
    slu = SubstructuredLU(a_bc, coords, n_blocks=2, bs=256,
                          dtype=jax.numpy.float64,
                          store_dtype=jax.numpy.bfloat16)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(a_bc.shape[0])
    x_ref = spla.splu(a_bc.tocsc()).solve(b)

    x = np.asarray(slu.solve(b), dtype=np.float64)
    raw = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert raw < 0.05, raw  # rounded factor alone: percent-level

    for sweeps in range(2):  # Richardson refinement against the exact A
        r = b - a_bc @ x
        x = x + np.asarray(slu.solve(r), dtype=np.float64)
    refined = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert refined < 3e-5, refined
    # output dtype follows the rhs, not the storage
    assert np.asarray(slu.solve(b)).dtype == np.float64


@pytest.mark.parametrize("store", [None, "bf16"])
def test_substructured_inverse_mode(bdf2_system, store, tmp_path, monkeypatch):
    """apply_mode='inverse' (explicit block inverses, pure-matmul apply)
    matches splu; bf16-stored inverses refine to the f32 class."""
    import scipy.sparse.linalg as spla

    monkeypatch.setenv("FLOWCONTROL_TPU_FACTOR_CACHE", str(tmp_path))
    a_bc, coords = bdf2_system
    sd = jax.numpy.bfloat16 if store == "bf16" else None
    slu = SubstructuredLU(a_bc, coords, n_blocks=2, bs=256,
                          dtype=jax.numpy.float64, store_dtype=sd,
                          apply_mode="inverse")
    rng = np.random.default_rng(3)
    b = rng.standard_normal(a_bc.shape[0])
    x_ref = spla.splu(a_bc.tocsc()).solve(b)
    x = np.asarray(slu.solve(b), dtype=np.float64)
    if store is None:
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8
    else:
        for _ in range(2):
            r = b - a_bc @ x
            x = x + np.asarray(slu.solve(r), dtype=np.float64)
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 3e-5
    # warm path: the cached inverse reproduces the same solve
    slu2 = SubstructuredLU(a_bc, coords, n_blocks=2, bs=256,
                           dtype=jax.numpy.float64, store_dtype=sd,
                           apply_mode="inverse")
    x2 = np.asarray(slu2.solve(b), dtype=np.float64)
    x1 = np.asarray(slu.solve(b), dtype=np.float64)
    assert np.allclose(x1, x2, rtol=1e-5, atol=1e-8)
