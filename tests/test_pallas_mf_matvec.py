"""Pallas streaming stack-matvec vs the XLA einsum it replaces.

Runs in Pallas interpret mode off-TPU (tests/conftest.py pins the cpu
platform), so numerical equality of the hand-scheduled kernel is pinned
without TPU hardware; on-chip it is the FC_MF_EINSUM=pallas A/B leg of
tools/profile_step.py."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flowcontrol_tpu.ops.pallas_mf_matvec import stack_matvec


@pytest.mark.parametrize(
    "m,p,q",
    [
        (1, 128, 128),
        (3, 256, 128),
        (5, 768, 1536),  # tile picker must fall back to 256/512
        (2, 384, 2048),
    ],
)
def test_stack_matvec_matches_einsum_f32(m, p, q):
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((m, p, q)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((m, q)), dtype=jnp.float32)
    out = np.asarray(stack_matvec(a, v))
    ref = np.einsum("mpq,mq->mp", np.asarray(a, np.float64),
                    np.asarray(v, np.float64))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-4 * np.sqrt(q))


def test_stack_matvec_bf16_accumulates_f32():
    rng = np.random.default_rng(8)
    m, p, q = 2, 256, 512
    a64 = rng.standard_normal((m, p, q))
    v64 = rng.standard_normal((m, q))
    a = jnp.asarray(a64, dtype=jnp.bfloat16)
    v = jnp.asarray(v64, dtype=jnp.bfloat16)
    out = np.asarray(stack_matvec(a, v), dtype=np.float64)
    ref = np.einsum(
        "mpq,mq->mp",
        np.asarray(a, np.float64),  # bf16-rounded operands, f64 reduction
        np.asarray(v, np.float64),
    )
    assert out.dtype == np.float64  # cast from bf16 output
    # f32 accumulation over bf16-rounded inputs: error ~ q**0.5 * 2^-8
    np.testing.assert_allclose(out, ref, rtol=0, atol=3e-2 * np.sqrt(q))


def test_stack_matvec_rejects_misaligned():
    a = jnp.zeros((2, 100, 128), dtype=jnp.float32)
    v = jnp.zeros((2, 128), dtype=jnp.float32)
    with pytest.raises(ValueError, match="128-aligned"):
        stack_matvec(a, v)
    with pytest.raises(ValueError, match="shape"):
        stack_matvec(jnp.zeros((2, 128, 128), jnp.float32),
                     jnp.zeros((2, 256), jnp.float32))
