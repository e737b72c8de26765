"""Pallas TPU kernel: fused blocked LU forward/back substitution.

The XLA version of block_lu_solve issues ~2·nb separate block matmuls per
solve, each a kernel launch re-reading state from HBM. This Pallas kernel
fuses the whole substitution into ONE kernel: the RHS panel lives in VMEM
for the entire solve, LU tiles are DMA-streamed from HBM with double
buffering, and every op is a tile-aligned (bs × bs)·(bs × B) matmul — the
solve runs at the HBM read speed of the factors (the speed of light for a
back-substitution).

VMEM budget (bs=512, B≤128, n≤20k): x panel ~10 MB + 2 LU tiles 2 MB +
diag-inverse tile 1 MB ≲ 16 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_solve_kernel(nb: int, bs: int):
    def kernel(lu_hbm, dinv_hbm, b_ref, x_ref, tile, dtile, sem, dsem):
        """b_ref/x_ref: (n_pad, B) VMEM; tile: (2, bs, bs); dtile: (bs, bs)."""
        x_ref[:] = b_ref[:]
        # ALL index arithmetic uses explicit i32 operands: under x64, mixing
        # a traced i32 with a Python int literal routes through an
        # int64 convert that Mosaic cannot lower (infinite _convert_helper
        # recursion)
        bs_i = jnp.int32(bs)
        one = jnp.int32(1)
        two = jnp.int32(2)

        def tile_dma(slot, k, j):
            return pltpu.make_async_copy(
                lu_hbm.at[pl.ds(k * bs_i, bs), pl.ds(j * bs_i, bs)],
                tile.at[slot],
                sem.at[slot],
            )

        def dinv_dma(k):
            return pltpu.make_async_copy(dinv_hbm.at[k], dtile, dsem)

        def row_accum(k, j_count, j_of):
            """acc = Σ_j lu[k, j_of(j)] @ x[j_of(j)], tiles DMA-streamed.

            Inline start/wait per tile (the double-buffered variant with a
            traced pl.when look-ahead trips Mosaic lowering under x64);
            Mosaic still overlaps the next iteration's DMA issue with the
            current matmul at the scheduler level.
            """

            def body(j, acc):
                slot = jax.lax.rem(j, two)
                cp = tile_dma(slot, k, j_of(j))
                cp.start()
                cp.wait()
                jj = j_of(j)
                return acc + jnp.dot(
                    tile[slot],
                    x_ref[pl.ds(jj * bs_i, bs), :],
                    preferred_element_type=acc.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

            # accumulate at (at least) the factor precision
            acc_dtype = (
                jnp.float32 if x_ref.dtype == jnp.bfloat16 else x_ref.dtype
            )
            acc0 = jnp.zeros((bs, x_ref.shape[1]), dtype=acc_dtype)
            # keep loop indices i32 throughout (x64 mode would promote the
            # Python-int lower bound to i64 and break Mosaic verification)
            return jax.lax.fori_loop(
                jnp.int32(0), jnp.asarray(j_count, jnp.int32), body, acc0
            )

        # ── forward: y_k = b_k − Σ_{j<k} L_kj y_j ──────────────────────────
        def fwd(k, c):
            acc = row_accum(k, k, lambda j: j)
            x_ref[pl.ds(k * bs_i, bs), :] = (
                x_ref[pl.ds(k * bs_i, bs), :] - acc.astype(x_ref.dtype)
            )
            return c

        # i32 everywhere: under x64, weak Python ints promote to i64, which
        # Mosaic cannot convert (infinite _convert_helper recursion)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), fwd, jnp.int32(0))

        # ── backward: x_k = Dk⁻¹ (y_k − Σ_{j>k} U_kj x_j) ──────────────────
        def bwd(i, c):
            k = jnp.int32(nb - 1) - i
            dinv_dma(k).start()
            acc = row_accum(k, i, lambda j: k + one + j)
            rhs_k = x_ref[pl.ds(k * bs_i, bs), :] - acc.astype(x_ref.dtype)
            dinv_dma(k).wait()
            x_ref[pl.ds(k * bs_i, bs), :] = jnp.dot(
                dtile[:], rhs_k, preferred_element_type=rhs_k.dtype,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(x_ref.dtype)
            return c

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), bwd, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("bs", "n"))
def pallas_block_lu_solve(factors, b, bs: int, n: int):
    """Fused-kernel replacement for solvers.block_lu.block_lu_solve.

    b: (..., n). Internally processed as (n_pad, B) with B lane-padded.
    """
    lu, dinv = factors
    n_pad = lu.shape[0]
    nb = n_pad // bs
    batch = b.shape[:-1]
    bt = jnp.asarray(b, dtype=lu.dtype).reshape(-1, b.shape[-1]).T  # (n, B)
    nrhs = bt.shape[1]
    b_lanes = max(128, -(-nrhs // 128) * 128)
    bt_p = jnp.zeros((n_pad, b_lanes), dtype=lu.dtype)
    bt_p = bt_p.at[:n, :nrhs].set(bt)

    x = pl.pallas_call(
        _make_solve_kernel(nb, bs),
        out_shape=jax.ShapeDtypeStruct((n_pad, b_lanes), lu.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # LU stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # diag inverses in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bs, bs), lu.dtype),
            pltpu.VMEM((bs, bs), lu.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.default_backend() == "cpu",
    )(lu, dinv, bt_p)
    return x[:n, :nrhs].T.reshape(batch + (n,))
