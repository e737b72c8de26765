"""DOF-sharded operator: correctness + memory scaling with device count.

The element-sharded SPMD path (parallel/sharding.py) replicates dof vectors;
this module verifies the TRUE domain-decomposition path
(parallel/dofsharding.py): dof vectors sharded over the mesh, halo exchange
via ppermute, and per-device element storage shrinking with n_devices
(ref analogue: dolfin/PETSc mesh partitioning, flowsolver.py:236-238).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import Mesh

from flowcontrol_tpu.fem.assembly import to_scipy_csr
from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace
from flowcontrol_tpu.mesh.generation import unit_square_mesh
from flowcontrol_tpu.parallel.dofsharding import DofPartition, DofShardedOperator


@pytest.fixture(scope="module")
def problem():
    from flowcontrol_tpu.fem.assembly import CellGeometry, mass_velocity_element

    mesh = unit_square_mesh(12, 12)
    space = TaylorHoodSpace.build(mesh)
    geom = CellGeometry(space)
    a_e = np.asarray(mass_velocity_element(geom))
    a_csr = to_scipy_csr(a_e, space.cell_dofs, space.n_dofs)
    return space, a_e, a_csr


def _mesh(n_dev):
    devs = jax.devices()[:n_dev]
    return Mesh(np.array(devs), ("space",))


@pytest.mark.parametrize("n_dev", [2, 4])
def test_dof_sharded_apply_matches_csr(problem, n_dev):
    space, a_e, a_csr = problem
    op = DofShardedOperator(a_e, space.cell_dofs, space, _mesh(n_dev))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(space.n_dofs)
    xs = op.shard_vector(x)
    y = op.unshard_vector(op.apply(xs))
    assert np.allclose(y, a_csr @ x, rtol=1e-10, atol=1e-12)


def test_dof_sharded_memory_scales(problem):
    """Per-device element storage AND vector shard shrink with n_devices."""
    space, a_e, a_csr = problem
    op2 = DofShardedOperator(a_e, space.cell_dofs, space, _mesh(2))
    op4 = DofShardedOperator(a_e, space.cell_dofs, space, _mesh(4))
    # element shards halve (up to load-imbalance padding)
    assert op4.per_device_nbytes() < 0.7 * op2.per_device_nbytes()
    # dof vector shards halve exactly
    assert op4.part.n_loc <= -(-op2.part.n_loc // 2) + 1
    # per-device addressing is the 3-block window, not the global vector
    assert op4._gt.shape[1] == 3 * op4.part.n_loc


def test_dof_partition_roundtrip(problem):
    space, *_ = problem
    part = DofPartition.build(space, 4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(space.n_dofs)
    assert np.allclose(part.from_spatial(part.to_spatial(x)), x)
