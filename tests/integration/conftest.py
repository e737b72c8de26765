"""Integration fixtures: coarse benchmark meshes at session scope.

Mirrors the reference's 3-tier integration strategy
(ref: tests/integration/conftest.py:6-10,15-77): `*_fast` tests run on
session-scoped coarse generated meshes every push; everything else is
auto-marked slow unless named `*_fast`.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "integration" in str(item.fspath) and "_fast" not in item.name:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def coarse_cylinder_mesh():
    from flowcontrol_tpu.mesh.generation import cylinder_mesh

    return cylinder_mesh(
        yinf=5.0, xinf=15.0, xinfa=-5.0, n1=4.0, n2=2.0, n3=0.8, segments=80
    )


@pytest.fixture(scope="session")
def coarse_cavity_mesh():
    from flowcontrol_tpu.mesh.generation import cavity_mesh

    return cavity_mesh(n_coarse=12, n_mid=25, n_fine=50)


@pytest.fixture(scope="session")
def coarse_pinball_mesh():
    from flowcontrol_tpu.mesh.generation import pinball_mesh

    return pinball_mesh(n1=4.0, n2=2.0, n3=0.8, segments=60, xinf=14.0)


@pytest.fixture(scope="session")
def regression_values():
    import json

    path = Path(__file__).parent / "regression_values.json"
    return json.loads(path.read_text()) if path.exists() else {}
