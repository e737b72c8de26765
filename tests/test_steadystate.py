"""Steady-state solver + NSForms scheme-surface behaviors mirrored from the
reference's dedicated unit files (ref: tests/test_steadystate.py,
tests/test_nsforms.py): Picard and Newton agree at low Re, both converge,
and unknown scheme orders raise."""
import numpy as np
import pytest

from flowcontrol_tpu.models.lidcavity import LidCavityFlowSolver


@pytest.fixture(scope="module")
def lid(tmp_path_factory):
    return LidCavityFlowSolver.make_default(
        Re=100, num_steps=2, verbose=0, n_mesh=12,
        path_out=tmp_path_factory.mktemp("ss"), solver_backend="host_lu",
        precision="f64",
    )


def test_picard_converges_low_re(lid):
    lid.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=30,
                             tol=1e-10)
    assert np.isfinite(lid.fields.U0).all()
    assert np.abs(lid.fields.U0).max() <= 1.0 + 1e-8  # lid-driven bound


def test_newton_matches_picard_low_re(lid, tmp_path):
    """ref: test_steadystate.py::test_same_solution_at_low_re."""
    fs2 = LidCavityFlowSolver.make_default(
        Re=100, num_steps=2, verbose=0, n_mesh=12, path_out=tmp_path,
        solver_backend="host_lu", precision="f64",
    )
    fs2.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=4)
    fs2.compute_steady_state(u_ctrl=[0.0], method="newton", max_iter=15,
                             initial_guess=fs2.fields.UP0)
    lid.compute_steady_state(u_ctrl=[0.0], method="picard", max_iter=30,
                             tol=1e-10)
    rel = (np.linalg.norm(fs2.fields.U0 - lid.fields.U0)
           / np.linalg.norm(lid.fields.U0))
    assert rel < 1e-7, rel


def test_unknown_scheme_order_raises(lid):
    """ref: test_nsforms.py::test_unknown_order_raises."""
    with pytest.raises(ValueError, match="order must be"):
        lid.forms.transient_lhs(3, lid.fields.U0
                                if lid.fields.U0 is not None
                                else np.zeros(lid.space.n_dofs))
    with pytest.raises(ValueError, match="order must be"):
        lid.forms.rhs_coefficients("bdf3")
