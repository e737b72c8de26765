"""Pallas batched-stack matvec for the multifrontal sweeps.

The single-stream multifrontal solve is one streaming read of the factor
stacks (solvers/multifrontal.py: ``inv (m,e,e)``, ``fbi (m,b,e)``,
``ginv (m,e,b)``) against VMEM-sized vectors — its speed-of-light is HBM
bandwidth, ~0.7 GB/ms on a v5e. XLA lowers the per-stage
``einsum("mpq,mq->mp")`` batched matvec through a generic batched-GEMM
path whose achieved bandwidth is an open question (tools/profile_step.py
measures it); this kernel is the hand-scheduled alternative for the A/B:

- grid = (m, p/TP, q/TQ), A tile ``(1, TP, TQ)`` streamed HBM->VMEM with
  Pallas' automatic double-buffering — A is read exactly once, which is
  the whole bandwidth story;
- the vector tile ``(1, TQ)`` and the f32 accumulator tile ``(1, TP)``
  stay in VMEM; the contraction runs as one ``(1,TQ)x(TP,TQ)^T``
  dot_general per tile (bandwidth-bound — MXU utilization is irrelevant
  at these shapes);
- accumulation across q-tiles uses the standard revisit pattern (the out
  tile's index_map ignores the q grid axis; q iterates fastest).

Used by ``multifrontal_solve`` when the static ``einsum='pallas'`` knob
is set (env ``FC_MF_EINSUM=pallas``), single-RHS + canonical 'ij' layout
only — the batched regime keeps XLA's einsum, which amortizes the factor
read over the batch. Falls back to interpret mode off-TPU so the CPU
test tier pins numerical equality without TPU hardware.

The stacks this kernel eats replace MUMPS' frontal eliminations
(ref: src/flowcontrol/flowsolver.py:812-814 hands the same solve to
sparse multifrontal LU on the host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(dim: int, cap: int) -> int:
    """Largest power-of-two multiple of 128 that divides ``dim``, capped."""
    t = cap
    while t > 128 and dim % t:
        t //= 2
    return t


def _mv_kernel(a_ref, v_ref, o_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # (1, TQ) x (TP, TQ) contracted on q -> (1, TP): the vector rides the
    # sublane dim so no in-kernel transposes appear
    # HIGHEST: Mosaic's dot default is a single bf16 MXU pass (2.5e-3 rel
    # error measured); the 3-pass f32 emulation is free here — the kernel
    # is bandwidth-bound on the A tile stream, not MXU-bound
    o_ref[0] += jax.lax.dot_general(
        v_ref[0], a_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _stack_matvec(a, v, interpret: bool):
    m, p, q = a.shape
    tp = _tile(p, 256)
    tq = _tile(q, 2048)
    # the vector/output carry a unit middle axis so their Pallas block
    # shapes end in (1, tile) with the 1 EQUAL to the array dim — Mosaic
    # requires the last two block dims be (8,128)-divisible or match the
    # array; a flat (1, tq) block over an (m, q) array is rejected
    out = pl.pallas_call(
        _mv_kernel,
        grid=(m, p // tp, q // tq),
        in_specs=[
            pl.BlockSpec((1, tp, tq), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            # the unit-axis index is i*0, not the literal 0: with x64 on
            # (config.py) a Python 0 traces as i64 and Mosaic rejects the
            # mixed (i32, i64, i32) index tuple
            pl.BlockSpec((1, 1, tq), lambda i, j, k: (i, i * 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tp), lambda i, j, k: (i, i * 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1, p), jnp.float32),
        interpret=interpret,
    )(a, v[:, None, :])
    return out[:, 0, :].astype(v.dtype)


def stack_matvec(a, v):
    """``out[m, p] = sum_q a[m, p, q] * v[m, q]`` — one streaming read of
    ``a``. Requires p, q multiples of 128 (the multifrontal stage buckets
    guarantee this); raises otherwise so the caller's fallback is loud."""
    m, p, q = a.shape
    if p % 128 or q % 128:
        raise ValueError(
            f"stack_matvec needs 128-aligned fronts, got (p={p}, q={q})"
        )
    if v.shape != (m, q):
        raise ValueError(f"v shape {v.shape} != {(m, q)}")
    interpret = jax.default_backend() != "tpu"
    return _stack_matvec(a, v, interpret)
