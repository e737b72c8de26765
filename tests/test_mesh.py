"""Mesh topology, generation quality, and DOF-map tests."""

import numpy as np
import pytest

from flowcontrol_tpu.mesh.dofmap import TaylorHoodSpace
from flowcontrol_tpu.mesh.generation import (
    cavity_mesh,
    cylinder_mesh,
    lidcavity_mesh,
    mesh_quality,
    pinball_mesh,
    unit_square_mesh,
)
from flowcontrol_tpu.mesh.mesh import Mesh2D


def test_unit_square_topology(small_mesh):
    assert small_mesh.num_vertices == 25
    assert small_mesh.num_cells == 32
    # Euler: V - E + F = 2 (F includes outer face)
    assert small_mesh.num_vertices - small_mesh.num_edges + small_mesh.num_cells == 1
    assert np.isclose(small_mesh.cell_areas().sum(), 1.0)


def test_boundary_facets(small_mesh):
    # 4 edges per side on a 4x4 grid
    assert small_mesh.boundary_facets.shape[0] == 16
    # outward normals: every boundary midpoint + eps*normal leaves the square
    mids = small_mesh.facet_midpoints()
    n = small_mesh.facet_normals()
    outside = mids + 1e-6 * n
    inside_domain = (
        (outside[:, 0] >= 0) & (outside[:, 0] <= 1)
        & (outside[:, 1] >= 0) & (outside[:, 1] <= 1)
    )
    assert not inside_domain.any()


def test_cells_ccw_oriented(small_mesh):
    p = small_mesh.coords[small_mesh.cells]
    area2 = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 2, 0] - p[:, 0, 0]
    ) * (p[:, 1, 1] - p[:, 0, 1])
    assert (area2 > 0).all()


def test_crossed_mesh():
    m = unit_square_mesh(4, 4, diagonal="crossed")
    assert m.num_cells == 64
    assert np.isclose(m.cell_areas().sum(), 1.0)


def test_mark_boundaries(small_mesh):
    markers = small_mesh.mark_boundaries(
        {
            "left": lambda x: np.abs(x[:, 0]) < 1e-9,
            "rest": lambda x: x[:, 0] > -1,  # everything; overwrites left
        }
    )
    # later predicate overwrites (dolfin .mark semantics)
    assert len(markers.facets("rest")) == 16
    assert len(markers.facets("left")) == 0


def test_locate_cells(small_mesh):
    pts = np.array([[0.51, 0.52], [0.01, 0.99]])
    cells, bary = small_mesh.locate_cells(pts)
    assert (bary >= -1e-12).all() and np.allclose(bary.sum(axis=1), 1.0)
    # reconstruct points from barycentric coords
    p = small_mesh.coords[small_mesh.cells[cells]]
    rec = np.einsum("nk,nkd->nd", bary, p)
    assert np.allclose(rec, pts)


def test_taylor_hood_dof_counts(small_mesh, small_space):
    nv, ne = small_mesh.num_vertices, small_mesh.num_edges
    assert small_space.n_vnodes == nv + ne
    assert small_space.n_dofs == 2 * (nv + ne) + nv
    # every cell has 15 distinct dofs
    assert small_space.cell_dofs.shape == (small_mesh.num_cells, 15)
    for row in small_space.cell_dofs[:4]:
        assert len(set(row.tolist())) == 15


def test_edge_midpoint_coords(small_space):
    mesh = small_space.mesh
    mids = small_space.vel_node_coords[mesh.num_vertices :]
    expected = 0.5 * (
        mesh.coords[mesh.edges[:, 0]] + mesh.coords[mesh.edges[:, 1]]
    )
    assert np.allclose(mids, expected)


@pytest.mark.slow
def test_generated_mesh_quality():
    for gen, kwargs in [
        (cylinder_mesh, dict(n1=5, n2=2.5, n3=0.8, segments=90)),
        (cavity_mesh, dict(n_coarse=12, n_mid=25, n_fine=50)),
        (pinball_mesh, dict(n1=5, n2=2.5, n3=0.8, segments=60)),
    ]:
        mesh = gen(**kwargs)
        q = mesh_quality(mesh)
        assert q["q_min"] > 0.15, f"{gen.__name__}: degenerate cells {q}"
        assert q["n_cells"] > 100


def test_lidcavity_mesh():
    m = lidcavity_mesh(8)
    assert np.isclose(m.cell_areas().sum(), 1.0)


def test_lidcavity_mesh_stretched():
    """tanh grading clusters grid lines at all four walls, keeps area 1."""
    m = lidcavity_mesh(16, stretch=2.0)
    assert np.isclose(m.cell_areas().sum(), 1.0)
    x = np.unique(m.coords[:, 0])
    dx = np.diff(x)
    assert dx[0] < 0.25 * dx.max()  # wall spacing ≪ mid-cavity spacing
    assert np.isclose(x[0], 0.0) and np.isclose(x[-1], 1.0)
    # symmetric about the center
    assert np.allclose(x, 1.0 - x[::-1])
    # anisotropic wall cells are intentional (boundary layers); only require
    # non-degeneracy
    assert m.cell_areas().min() > 0
    assert mesh_quality(m)["q_min"] > 0.01


def test_mesh_io_roundtrip(tmp_path, small_mesh):
    from flowcontrol_tpu.mesh.io import read_xdmf_mesh, write_xdmf_mesh

    path = tmp_path / "m.xdmf"
    write_xdmf_mesh(path, small_mesh)
    m2 = read_xdmf_mesh(path)
    assert np.allclose(m2.coords, small_mesh.coords)
    assert (m2.cells == small_mesh.cells).all()


def test_reads_reference_format_xdmf(tmp_path):
    """Mesh reader understands the dolfin-style XDMF layout."""
    import h5py

    h5 = tmp_path / "ref.h5"
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    cells = np.array([[0, 1, 2], [1, 3, 2]])
    with h5py.File(h5, "w") as f:
        f["data0"] = coords
        f["data1"] = cells
    xdmf = tmp_path / "ref.xdmf"
    xdmf.write_text(
        '<Xdmf Version="3.0"><Domain><Grid Name="Grid">'
        '<Geometry GeometryType="XY"><DataItem DataType="Float" '
        'Dimensions="4 2" Format="HDF" Precision="8">ref.h5:/data0</DataItem>'
        '</Geometry><Topology NodesPerElement="3" NumberOfElements="2" '
        'TopologyType="Triangle"><DataItem DataType="Int" Dimensions="2 3" '
        'Format="HDF" Precision="8">ref.h5:/data1</DataItem></Topology>'
        "</Grid></Domain></Xdmf>"
    )
    m = read_xdmf_mesh_safe(xdmf)
    assert m.num_cells == 2


def read_xdmf_mesh_safe(path):
    from flowcontrol_tpu.mesh.io import read_xdmf_mesh

    return read_xdmf_mesh(path)
