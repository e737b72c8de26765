"""Blocked matmul LU (solvers/block_lu.py) correctness."""

import numpy as np

from flowcontrol_tpu.solvers.block_lu import BlockLU


def test_block_lu_random():
    rng = np.random.default_rng(0)
    n = 300
    a = np.eye(n) * 3 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    blu = BlockLU(a, bs=64, dtype=np.float64)
    x = np.asarray(blu.solve(b))
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-10


def test_block_lu_batched():
    rng = np.random.default_rng(1)
    n = 200
    a = np.eye(n) * 2 + 0.3 * rng.standard_normal((n, n))
    b = rng.standard_normal((5, n))
    blu = BlockLU(a, bs=64, dtype=np.float64)
    x = np.asarray(blu.solve(b))
    for k in range(5):
        assert np.linalg.norm(a @ x[k] - b[k]) < 1e-9 * np.linalg.norm(b[k])


def test_block_lu_padding():
    """n not a multiple of bs — padded with identity."""
    rng = np.random.default_rng(2)
    n = 173
    a = np.eye(n) * 4 + 0.2 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    blu = BlockLU(a, bs=64, dtype=np.float64)
    x = np.asarray(blu.solve(b))
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-10


def test_block_lu_saddle_structure():
    """Velocity-first saddle-ish matrix with identity BC rows (the actual
    time-step matrix structure): pivot-free blocked LU must stay stable."""
    import scipy.sparse as sp

    from flowcontrol_tpu.fem.assembly import CellGeometry, to_scipy_csr
    from flowcontrol_tpu.fem.bc import BCSet, DirichletBC
    from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace
    from flowcontrol_tpu.mesh.generation import unit_square_mesh
    from flowcontrol_tpu.core.nsforms import NSForms

    mesh = unit_square_mesh(8)
    space = TaylorHoodSpace.build(mesh)
    geom = CellGeometry(space)
    forms = NSForms(space=space, geom=geom, Re=100.0, dt=0.005)
    u0 = np.zeros((space.n_vnodes, 2))
    u0[:, 0] = 1.0
    lhs_e = forms.transient_lhs(2, u0)
    a_csr = to_scipy_csr(lhs_e, space.cell_dofs, space.n_dofs)
    bnodes = space.boundary_vel_nodes(
        np.arange(mesh.boundary_facets.shape[0])
    )
    bcs = BCSet(
        [
            DirichletBC(
                dofs=np.concatenate([2 * bnodes, 2 * bnodes + 1]), values=0.0
            ),
            DirichletBC(dofs=np.array([2 * space.n_vnodes]), values=0.0),
        ],
        space.n_dofs,
    )
    a_bc, _ = bcs.eliminate_csr(a_csr)
    a = np.asarray(a_bc.todense())
    rng = np.random.default_rng(3)
    b = rng.standard_normal(space.n_dofs)
    blu = BlockLU(a, bs=128, dtype=np.float64)
    x = np.asarray(blu.solve(b))
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 1e-8, rel
