"""Fused Pallas blocked-LU solve vs the XLA reference (interpret mode on CPU)."""

import numpy as np

from flowcontrol_tpu.ops.pallas_trisolve import pallas_block_lu_solve
from flowcontrol_tpu.solvers.block_lu import BlockLU


def test_pallas_solve_matches_xla():
    rng = np.random.default_rng(0)
    n = 300
    a = np.eye(n) * 30 + 0.3 * rng.standard_normal((n, n))
    blu = BlockLU(a, bs=128, dtype=np.float64)
    b = rng.standard_normal((3, n))
    x_ref = np.asarray(blu.solve(b))
    x_pl = np.asarray(pallas_block_lu_solve((blu.lu, blu.dinv), b, bs=128, n=n))
    assert np.abs(x_pl - x_ref).max() < 1e-12


def test_pallas_solve_single_rhs():
    rng = np.random.default_rng(1)
    n = 256
    a = np.eye(n) * 10 + 0.2 * rng.standard_normal((n, n))
    blu = BlockLU(a, bs=128, dtype=np.float64)
    b = rng.standard_normal(n)
    x = np.asarray(pallas_block_lu_solve((blu.lu, blu.dinv), b, bs=128, n=n))
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-12
