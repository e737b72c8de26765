"""Pallas window-blocked nonlinear convection: the one-hot pick/scatter
masks generated ON-CHIP in VMEM instead of materialized in HBM.

The XLA ``onehot`` variant of :mod:`flowcontrol_tpu.ops.cellwindows` is
HBM-bound on its own mask: at the 235k stock cavity the (406 blocks x 768
picks x 1536 window) f32 mask is ~1.9 GB that XLA materializes (chunked)
and reads twice — measured 5.1 ms/step of the 15.6 ms single-stream step,
while the data actually moved (window values, geometry tables, results)
is ~50 MB. This kernel keeps the mask virtual: each grid step builds the
(w, 768) one-hot tile by an iota==index compare in VMEM, applies it by
MXU matmul, and reuses the SAME tile for the pick and the scatter — HBM
traffic collapses to the real inputs/outputs.

Numerical contract (matches cellwindows' HIGH-precision einsums or
better): the pick/scatter matmuls run the f32 operand as an explicit
3-term bfloat16 split (hi + lo + lo2, each row pair dotted against the
exact-in-bf16 0/1 mask with f32 accumulation). For the pick each output
element receives exactly ONE nonzero product per term, so the result is
the f32 value to 2^-24 — no cancellation path exists. The per-cell
quadrature between them is plain f32 VPU arithmetic (no MXU truncation
at all, one notch better than the XLA path's bf16x3 einsums).

Layout contract (built by :func:`build_nl_pallas` from the cellwindows
build): picks are NODE-MAJOR, m = n_loc*128 + cell, so every per-node
slice of the 768 lanes is a 128-lane block and the quadrature never
reshapes across the lane dimension.

Role in the reference: the per-step nonlinear RHS reassembly
(ref: src/flowcontrol/flowsolver.py:703-799, nsforms.py:294-296).
"""
from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

_RC = 128  # cells per block (= cellwindows._RC)
_WCHUNK = 1024  # mask-tile window chunk: (1024, 768) int32+bf16 < 4.5 MB VMEM


def _split3(x, axis=0):
    """f32 -> (hi, lo, lo2) bfloat16 split concatenated along ``axis``:
    hi+lo+lo2 reproduces x to ~2^-24 relative."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    lo = r1.astype(jnp.bfloat16)
    lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo, lo2], axis=axis)


def _nl_kernel(rel_ref, uwin_ref, wq_ref, dphi2_ref, phi2_ref, phi2t_ref,
               out_ref, *, w: int, n_loc: int, nq: int):
    """One cell block: pick -> quadrature -> scatter, mask never leaves
    VMEM. Shapes (leading grid-block dim 1 dropped by [0]):
      rel    (1, 1, 768)       window-relative pick index, node-major
      uwin   (1, 2, w)         window velocity values (components x window)
      wq     (1, nq, 128)      quadrature weights x cells
      dphi2  (1, n_loc, nq*2, 128)  grad basis, n-major [n][q*2+i][cell]
      phi2   (nq, n_loc), phi2t (n_loc, nq)
      out    (1, 2, w)
    """
    m = n_loc * _RC  # 768 picks
    rel = rel_ref[0]  # (1, m) int32
    # The (w, m) one-hot tile is built in W-CHUNKS so VMEM stays bounded
    # at any window width (a full mask at the 302k pinball's w overflows
    # the ~16 MB VMEM and faults the kernel; the chunk is rebuilt for the
    # scatter — mask generation is VPU-cheap, holding it is not).
    wb = w // _RC
    wc = _RC * max(d for d in range(1, wb + 1)
                   if wb % d == 0 and d * _RC <= _WCHUNK)
    rel_b = jnp.broadcast_to(rel, (wc, m))

    def _oht(k):
        wi = lax.broadcasted_iota(jnp.int32, (wc, m), 0) + k * wc
        return (wi == rel_b).astype(jnp.bfloat16)

    # pick: u_e6 rows = [hi_x, hi_y, lo_x, lo_y, lo2_x, lo2_y] @ oht
    uwin6 = _split3(uwin_ref[0], axis=0)  # (6, w) bf16
    u_e6 = jnp.zeros((6, m), jnp.float32)
    for k in range(w // wc):
        u_e6 = u_e6 + lax.dot_general(
            uwin6[:, k * wc:(k + 1) * wc], _oht(k), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    u_e = u_e6[0:2] + u_e6[2:4] + u_e6[4:6]  # (2, m) == u[rel] to 2^-24

    wq = wq_ref[0]          # (nq, 128)
    dphi2 = dphi2_ref[0]    # (n_loc, nq*2, 128)
    phi2 = phi2_ref[:]      # (nq, n_loc)
    phi2t = phi2t_ref[:]    # (n_loc, nq)

    # per-cell quadrature in cell-last layout (all VPU, f32):
    #   u_q[i,q,c]   = sum_n phi2[q,n] u_e[i, n*128+c]
    #   g_q[q,i,d,c] = sum_n dphi2[c,q,n,i] u_e[d, n*128+c]
    u_q = jnp.zeros((2, nq, _RC), jnp.float32)
    g_q = jnp.zeros((nq, 2, 2, _RC), jnp.float32)
    for n in range(n_loc):
        u_en = u_e[:, n * _RC:(n + 1) * _RC]  # (2, 128)
        u_q = u_q + phi2t[n:n + 1][..., None] * u_en[:, None, :]
        dp_n = dphi2[n].reshape(nq, 2, _RC)  # [q, i, c]
        g_q = g_q + dp_n[:, :, None, :] * u_en[None, None, :, :]
    # conv_q[q,d,c] = sum_i u_q[i,q,c] g_q[q,i,d,c]; then x wq
    conv_q = (u_q[0][:, None, :] * g_q[:, 0] +
              u_q[1][:, None, :] * g_q[:, 1])  # (nq, 2, 128)
    tmp = wq[:, None, :] * conv_q  # (nq, 2, 128)
    # r_e[a,d,c] = sum_q phi2[q,a] tmp[q,d,c], assembled node-major
    r_parts = []
    for a in range(n_loc):
        r_parts.append(
            jnp.sum(phi2[:, a:a + 1][:, :, None] * tmp, axis=0))  # (2, 128)
    r_e = jnp.concatenate(r_parts, axis=1)  # (2, m) node-major

    # scatter: yw[d, wi] = sum_m r_e[d, m] ohT[wi, m] — same 3-term split,
    # f32 accumulation over the (multiple) cells hitting each window slot
    r_e6 = _split3(r_e, axis=0)  # (6, m) bf16
    for k in range(w // wc):
        yw6 = lax.dot_general(
            r_e6, _oht(k), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (6, wc)
        out_ref[0, :, k * wc:(k + 1) * wc] = (
            yw6[0:2] + yw6[2:4] + yw6[4:6]
        )


@functools.partial(jax.jit, static_argnames=("w", "n_loc", "nq"))
def _nl_pallas_call(rel, uwin_t, wq_t, dphi2_t, phi2, phi2t,
                    *, w: int, n_loc: int, nq: int):
    nb = rel.shape[0]
    kern = functools.partial(_nl_kernel, w=w, n_loc=n_loc, nq=nq)
    m = n_loc * _RC
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            # unit-axis indices are i*0, not literal 0: with x64 on
            # (config.py) a Python 0 traces as i64 and Mosaic rejects the
            # mixed (i32, i64, ...) index tuple (see pallas_mf_matvec.py)
            pl.BlockSpec((1, 1, m), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, 2, w), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, nq, _RC), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, n_loc, nq * 2, _RC),
                         lambda i: (i, i * 0, i * 0, i * 0)),
            pl.BlockSpec((nq, n_loc), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((n_loc, nq), lambda i: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, w), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 2, w), jnp.float32),
        # CPU/testing: run the kernel through the Pallas interpreter so
        # the math is validated on any backend
        interpret=jax.default_backend() != "tpu",
    )(rel, uwin_t, wq_t, dphi2_t, phi2, phi2t)


def build_nl_pallas(tree, static):
    """Derive the node-major device tables this kernel needs from a
    ``cellwindows.build_cell_windows`` (tree, static) pair. Returns the
    extra tree entries to merge into the device pytree (all host->device
    once at build)."""
    n_loc, w, nq = static["n_loc"], static["w"], tree["wq"].shape[-1]
    nb = tree["win"].shape[0]
    rel = np.asarray(tree["rel"]).reshape(nb, _RC, n_loc)
    rel_nm = np.transpose(rel, (0, 2, 1)).reshape(nb, 1, n_loc * _RC)
    wq = np.asarray(tree["wq"]).reshape(nb, _RC, nq)
    wq_t = np.ascontiguousarray(np.transpose(wq, (0, 2, 1)))
    dphi2 = np.asarray(tree["dphi2"]).reshape(nb, _RC, nq, n_loc, 2)
    # -> (nb, n_loc, nq*2, cells)
    dphi2_t = np.ascontiguousarray(
        np.transpose(dphi2, (0, 3, 2, 4, 1)).reshape(nb, n_loc, nq * 2, _RC)
    )
    phi2 = np.asarray(tree["phi2"])
    return {
        "rel_nm": jnp.asarray(rel_nm, dtype=jnp.int32),
        "wq_t": jnp.asarray(wq_t, dtype=jnp.float32),
        "dphi2_t": jnp.asarray(dphi2_t, dtype=jnp.float32),
        "phi2": jnp.asarray(phi2, dtype=jnp.float32),
        "phi2t": jnp.asarray(phi2.T, dtype=jnp.float32),
    }


def nonlinear_convection_pallas(tree, static, u_mixed, n_dofs: int):
    """Drop-in single-stream replacement for
    ``cellwindows.nonlinear_convection_windowed`` (split hot layout only;
    callers fall back to the XLA variant for batched operands)."""
    n_vnodes, n_loc, w = static["n_vnodes"], static["n_loc"], static["w"]
    nq = tree["wq_t"].shape[1]
    nb = tree["win"].shape[0]
    assert u_mixed.ndim == 1 and static.get("split"), \
        "pallas NL path is single-stream / split-layout only"
    dt = u_mixed.dtype
    n_rows = static["n_rows"]
    wb = w // 128

    # window rows in component-major layout: (2, nb, w) with zero element
    # permutes (hot split layout)
    u2 = u_mixed[: 2 * n_vnodes].reshape(2, n_vnodes)
    pad = n_rows * 128 - n_vnodes
    up = jnp.concatenate([u2, jnp.zeros((2, pad), dtype=dt)], axis=-1)
    rows = up.reshape(2, n_rows, 128)
    uwin = jnp.take(rows, tree["win"], axis=1)  # (2, nb, wb, 128)
    uwin_t = jnp.moveaxis(uwin.reshape(2, nb, w), 1, 0)  # (nb, 2, w)

    yw_t = _nl_pallas_call(
        tree["rel_nm"], uwin_t.astype(jnp.float32), tree["wq_t"],
        tree["dphi2_t"], tree["phi2"], tree["phi2t"],
        w=w, n_loc=n_loc, nq=nq,
    )  # (nb, 2, w)

    # per-block window rows scatter-add (same epilogue as cellwindows)
    yrows = jnp.zeros((2, n_rows, 128), dtype=jnp.float32)
    yrows = yrows.at[:, tree["win"], :].add(
        jnp.moveaxis(yw_t, 1, 0).reshape(2, nb, wb, 128)
    )
    y2 = yrows.reshape(2, n_rows * 128)[:, :n_vnodes]
    out = jnp.zeros((n_dofs,), dtype=dt)
    return out.at[: 2 * n_vnodes].set(y2.reshape(-1).astype(dt))
