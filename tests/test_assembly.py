"""FEM element/assembly correctness: exactness, symmetry, autodiff parity."""

import jax.numpy as jnp
import numpy as np

from flowcontrol_tpu.fem import element as el
from flowcontrol_tpu.fem.assembly import (
    apply_element_tensors,
    linear_operator_element,
    mass_velocity_element,
    nonlinear_convection,
    nonlinear_convection_np,
    geometry_device_tables,
    place_velocity_scalar,
    scalar_mass_p1,
    scalar_mass_p2,
    scalar_stiffness_p2,
    steady_jacobian_elements_autodiff,
    steady_residual,
    to_scipy_csr,
)


def test_quadrature_degree5_exact():
    """The 7-point rule integrates x^a y^b exactly for a+b <= 5."""
    # reference triangle (0,0),(1,0),(0,1): ∫ x^a y^b = a! b! / (a+b+2)!
    from math import factorial

    pts = el.QP_BARY[:, 1:]  # (x, y) on the reference triangle
    for a in range(6):
        for b in range(6 - a):
            num = 0.5 * np.sum(el.QP_W * pts[:, 0] ** a * pts[:, 1] ** b)
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
            assert abs(num - exact) < 1e-14, (a, b)


def test_p2_partition_of_unity():
    assert np.allclose(el.PHI2.sum(axis=1), 1.0)
    assert np.allclose(el.p2_grad_ref(el.QP_BARY).sum(axis=1), 0.0)


def test_p2_nodal_basis():
    """P2 shape functions are 1 at their own node, 0 at others."""
    nodes_bary = np.array(
        [
            [1, 0, 0], [0, 1, 0], [0, 0, 1],
            [0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0],
        ],
        dtype=float,
    )
    vals = el.p2_shape(nodes_bary)
    assert np.allclose(vals, np.eye(6), atol=1e-14)


def test_mass_total(small_geom, small_space):
    m = to_scipy_csr(
        mass_velocity_element(small_geom), small_space.cell_dofs, small_space.n_dofs
    )
    ones = np.zeros(small_space.n_dofs)
    ones[: small_space.n_vel_dofs] = 1.0
    assert np.isclose(ones @ (m @ ones), 2.0)  # 2 components × unit area


def test_stiffness_annihilates_constants(small_geom, small_space):
    k = to_scipy_csr(
        place_velocity_scalar(scalar_stiffness_p2(small_geom)),
        small_space.cell_dofs,
        small_space.n_dofs,
    )
    ones = np.zeros(small_space.n_dofs)
    ones[: small_space.n_vel_dofs] = 1.0
    assert np.abs(k @ ones).max() < 1e-12


def test_stiffness_linear_field_energy(small_geom, small_space):
    """∫|∇u|² for u=(x, 0) equals 1 on the unit square."""
    k = to_scipy_csr(
        place_velocity_scalar(scalar_stiffness_p2(small_geom)),
        small_space.cell_dofs,
        small_space.n_dofs,
    )
    u = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], np.zeros(len(x))], axis=1)
    )
    up = np.concatenate([u.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    assert np.isclose(up @ (k @ up), 1.0)


def test_pressure_mass_total(small_geom, small_space):
    m1 = scalar_mass_p1(small_geom)
    assert np.isclose(m1.sum(), 1.0)


def test_divergence_free_field(small_geom, small_space):
    """Pressure rows of A·up vanish for div-free u=(x,-y) (interior exactness)."""
    u = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], -x[:, 1]], axis=1)
    )
    up = np.concatenate([u.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    a_e = linear_operator_element(
        small_geom, np.zeros((small_space.mesh.num_cells, 6, 2)), inv_re=1.0
    )
    y = np.asarray(
        apply_element_tensors(
            jnp.asarray(a_e), small_space.cell_dofs, jnp.asarray(up),
            small_space.n_dofs,
        )
    )
    assert np.abs(y[small_space.n_vel_dofs :]).max() < 1e-14


def test_saddle_point_symmetry(small_geom, small_space):
    """-p div(v) and -q div(u) blocks are transposes of each other."""
    a_e = linear_operator_element(
        small_geom, np.zeros((small_space.mesh.num_cells, 6, 2)), inv_re=1.0
    )
    a = to_scipy_csr(a_e, small_space.cell_dofs, small_space.n_dofs).toarray()
    nv = small_space.n_vel_dofs
    bup = a[:nv, nv:]
    blo = a[nv:, :nv]
    assert np.allclose(bup, blo.T)


def test_nonlinear_convection_known_field(small_geom, small_space):
    """(u·∇)u for u=(x,-y) is (x, y): N(u) == M @ (x, y)."""
    u = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], -x[:, 1]], axis=1)
    )
    up = np.concatenate([u.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    n_vec = nonlinear_convection_np(small_geom, small_space, up)
    m = to_scipy_csr(
        mass_velocity_element(small_geom), small_space.cell_dofs, small_space.n_dofs
    )
    w = small_space.interpolate_velocity(
        lambda x: np.stack([x[:, 0], x[:, 1]], axis=1)
    )
    wp = np.concatenate([w.reshape(-1), np.zeros(small_space.n_pressure_dofs)])
    assert np.abs(n_vec - m @ wp).max() < 1e-14


def test_nonlinear_jax_matches_numpy(small_geom, small_space, rng):
    up = rng.normal(size=small_space.n_dofs)
    ref = nonlinear_convection_np(small_geom, small_space, up)
    dev = np.asarray(
        nonlinear_convection(
            geometry_device_tables(small_geom), small_space, jnp.asarray(up)
        )
    )
    assert np.abs(ref - dev).max() < 1e-12


def test_nonlinear_batched(small_geom, small_space, rng):
    ups = rng.normal(size=(3, small_space.n_dofs))
    tables = geometry_device_tables(small_geom)
    batched = np.asarray(
        nonlinear_convection(tables, small_space, jnp.asarray(ups))
    )
    for i in range(3):
        single = nonlinear_convection_np(small_geom, small_space, ups[i])
        assert np.abs(batched[i] - single).max() < 1e-12


def test_autodiff_vs_manual_jacobian(small_geom, small_space, rng):
    """Element-level jax.jacfwd of the residual == hand-coded linearization.

    Mirrors the reference's autodiff-vs-manual A agreement test to 1e-10
    (ref: tests/integration/test_operatorgetter.py:89-103).
    """
    up = 0.3 * rng.normal(size=small_space.n_dofs)
    u0 = up[: small_space.n_vel_dofs].reshape(small_space.n_vnodes, 2)
    j_man = linear_operator_element(
        small_geom, u0[small_space.cell_vel_nodes, :], inv_re=0.01
    )
    j_ad = np.asarray(
        steady_jacobian_elements_autodiff(
            small_geom, small_space, jnp.asarray(up), 0.01
        )
    )
    rel = np.abs(j_man - j_ad).max() / np.abs(j_man).max()
    assert rel < 1e-12


def test_residual_fd_jacobian(small_geom, small_space, rng):
    """Global finite-difference Jacobian check on a few directions.

    Mirrors the reference's FD Jacobian validation
    (ref: tests/integration/test_operatorgetter.py:106-130).
    """
    up = 0.2 * rng.normal(size=small_space.n_dofs)
    u0 = up[: small_space.n_vel_dofs].reshape(small_space.n_vnodes, 2)
    a = to_scipy_csr(
        linear_operator_element(
            small_geom, u0[small_space.cell_vel_nodes, :], inv_re=0.1
        ),
        small_space.cell_dofs,
        small_space.n_dofs,
    )
    r0 = np.asarray(steady_residual(small_geom, small_space, jnp.asarray(up), 0.1))
    eps = 1e-6
    for _ in range(3):
        d = rng.normal(size=small_space.n_dofs)
        d /= np.linalg.norm(d)
        r1 = np.asarray(
            steady_residual(small_geom, small_space, jnp.asarray(up + eps * d), 0.1)
        )
        fd = (r1 - r0) / eps
        an = a @ d
        assert np.abs(fd - an).max() < 1e-4
