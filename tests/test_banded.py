"""Window-banded operator application (ops/banded.py).

The banded apply replaces the gather-table element apply for constant
operators in the hot step (ref counterpart: the PETSc CSR matvecs inside
src/flowcontrol/flowsolver.py:703-799). It must agree with the scipy CSR
product to rounding and leave stepper trajectories unchanged.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from flowcontrol_tpu.fem.assembly import to_scipy_csr
from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver
from flowcontrol_tpu.ops.banded import banded_matvec, build_banded


@pytest.fixture(scope="module")
def lid(tmp_path_factory):
    return LidCavityFlowSolver.make_default(
        Re=500, num_steps=5, verbose=0, n_mesh=12,
        path_out=tmp_path_factory.mktemp("b"), solver_backend="host_lu",
        precision="f64",
    )


def test_banded_matches_csr(lid):
    space, forms = lid.space, lid.forms
    n = space.n_dofs
    m = to_scipy_csr(forms.mass_elements(), space.cell_dofs, n).tocsr()
    tree = build_banded(m, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    y = np.asarray(banded_matvec(tree, jnp.asarray(x)))
    assert np.allclose(y, m @ x, atol=1e-12)
    # batched (leading dims)
    xb = rng.standard_normal((3, 2, n))
    yb = np.asarray(banded_matvec(tree, jnp.asarray(xb)))
    assert np.allclose(yb, xb @ m.T.toarray(), atol=1e-12)


def test_banded_memory_cap(lid):
    space, forms = lid.space, lid.forms
    n = space.n_dofs
    m = to_scipy_csr(forms.mass_elements(), space.cell_dofs, n).tocsr()
    assert build_banded(m, max_bytes=1000) is None


def test_stepper_banded_trajectory(lid, tmp_path):
    """banded_operators=True reproduces the host_lu trajectory."""
    def run(**kw):
        fs = LidCavityFlowSolver.make_default(
            Re=500, num_steps=5, verbose=0, n_mesh=12,
            path_out=tmp_path / str(len(kw)), precision="f64", **kw,
        )
        fs.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=4)
        fs.initialize_time_stepping()
        for _ in range(5):
            y = fs.step(np.zeros(1))
        return y, np.asarray(fs.fields.up_)

    y1, x1 = run(solver_backend="host_lu")
    y2, x2 = run(
        solver_backend="host_lu", stepper_options={"banded_operators": True}
    )
    assert np.allclose(x1, x2, atol=1e-10)
    assert np.allclose(y1, y2, atol=1e-12)
