"""Native C kernels (flowcontrol_tpu/native) vs numpy fallbacks."""

import numpy as np
import pytest

from flowcontrol_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler available"
)


def test_locate_points_matches_numpy(medium_mesh):
    rng = np.random.default_rng(0)
    pts = rng.random((50, 2)) * 0.96 + 0.02
    c_nat, b_nat = native.locate_points(medium_mesh.coords, medium_mesh.cells, pts)
    # verify barycentric reconstruction (cells may differ on edges)
    p = medium_mesh.coords[medium_mesh.cells[c_nat]]
    rec = np.einsum("nk,nkd->nd", b_nat, p)
    assert np.allclose(rec, pts, atol=1e-12)
    assert (b_nat > -1e-9).all()


def test_locate_points_outside_raises(medium_mesh):
    with pytest.raises(ValueError):
        native.locate_points(
            medium_mesh.coords, medium_mesh.cells, np.array([[5.0, 5.0]])
        )


def test_gather_table_matches_numpy():
    from flowcontrol_tpu.fem import assembly

    rng = np.random.default_rng(1)
    dofs = rng.integers(0, 200, 1500).astype(np.int32)
    t_nat = native.build_gather_table(dofs, 200)
    # numpy reference (bypass the native hook)
    m = len(dofs)
    order = np.argsort(dofs, kind="stable")
    counts = np.bincount(dofs, minlength=200)
    kmax = counts.max()
    starts = np.zeros(201, dtype=np.int64)
    starts[1:] = np.cumsum(counts)
    col = np.arange(m) - starts[dofs[order]]
    t_ref = np.full((200, kmax), m, dtype=np.int32)
    t_ref[dofs[order], col] = order
    assert t_nat.shape == t_ref.shape
    # same multiset of sources per dof (order within a dof is insertion order
    # for native, sorted-stable for numpy — compare as sets)
    for d in range(200):
        assert set(t_nat[d].tolist()) == set(t_ref[d].tolist()), d


def test_gather_table_used_in_assembly(small_space):
    """End-to-end: apply with the (possibly native) table == scatter apply."""
    import jax.numpy as jnp

    from flowcontrol_tpu.fem.assembly import (
        CellGeometry,
        apply_element_tensors,
        apply_element_tensors_gather,
        build_gather_table,
        mass_velocity_element,
    )

    geom = CellGeometry(small_space)
    m_e = mass_velocity_element(geom)
    table = build_gather_table(small_space.cell_dofs, small_space.n_dofs)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(small_space.n_dofs))
    y1 = np.asarray(
        apply_element_tensors(jnp.asarray(m_e), small_space.cell_dofs, x,
                              small_space.n_dofs)
    )
    y2 = np.asarray(
        apply_element_tensors_gather(jnp.asarray(m_e), small_space.cell_dofs,
                                     jnp.asarray(table), x, small_space.n_dofs)
    )
    assert np.allclose(y1, y2, atol=1e-12)
