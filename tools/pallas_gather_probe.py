"""Probe: does Mosaic compile dynamic gathers inside a TPU Pallas kernel?

The multifrontal solve's remaining fusion step — ONE kernel for the whole
forward sweep with the work vector and contribution buffer resident in
VMEM (they are ~2 MB even at 235k dofs) — needs per-element dynamic
gathers (`jnp.take`) from VMEM inside the kernel for the inbox tables
(solvers/multifrontal.py:_gather_sum_t). This probes each primitive the
mono-kernel would need, on the real TPU, and prints PASS/FAIL per
pattern. Run when the relay tunnel is up; decides whether the
mono-kernel design is buildable or the per-stage pallas_call split
(ops/pallas_mf_matvec.py) stays the end state.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"PASS  {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:  # noqa: BLE001 — report any compile/runtime failure
        lines = str(e).splitlines()
        msg = lines[0][:160] if lines else repr(e)[:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def main():
    n, k = 1024, 8
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    idx2d = jnp.asarray(rng.integers(0, n, (k, 128)), dtype=jnp.int32)

    # 1. jnp.take with a 2-D index table (the inbox shape) from VMEM
    def k_take(v_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(v_ref[:], i_ref[:], axis=0).sum(axis=0)[None]

    probe("take_2d_table", lambda: pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v, idx2d))

    # 2. vector gather along the lane dim of a 2-D VMEM value
    v2 = jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32)
    lanes = jnp.asarray(rng.integers(0, n, (8, 128)), dtype=jnp.int32)

    def k_tka(v_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(v_ref[:], i_ref[:], axis=1)

    probe("take_along_axis_lanes", lambda: pl.pallas_call(
        k_tka,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v2, lanes))

    # 3. dynamic scalar-offset slice (pl.ds) from a VMEM scratch vector
    def k_ds(v_ref, s_ref, o_ref):
        o_ref[:] = v_ref[pl.ds(s_ref[0], 128)][None]

    probe("dynamic_slice_smem_offset", lambda: pl.pallas_call(
        k_ds,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v, jnp.asarray([640], dtype=jnp.int32)))

    # 4. accumulating dynamic-offset store (the contribution-buffer write)
    def k_accum(v_ref, s_ref, o_ref):
        o_ref[pl.ds(s_ref[0], 128)] += v_ref[pl.ds(0, 128)]

    probe("dynamic_offset_accum_store", lambda: pl.pallas_call(
        k_accum,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v, jnp.asarray([256], dtype=jnp.int32)))

    print("platform:", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
