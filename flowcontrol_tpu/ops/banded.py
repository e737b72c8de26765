"""Window-banded sparse matvec: constant-operator application with no gathers.

A constant sparse operator applied inside the hot step (the velocity mass M;
CN's velocity operator) costs a full gather/scatter element pass through the
ELL gather tables (~5 ms at 56k dofs on v5e — the measured single-stream
bottleneck). Reordered by reverse Cuthill-McKee the operator's bandwidth
drops to O(sqrt(n)), so each 128-row block only ever reads a short static
column window: the apply becomes

    1-D permute -> pad -> per-block static window rows -> one batched
    (nb,128,W)x(nb,W) einsum -> inverse permute

with zero data-dependent gathers except the two 1-D permutes (measured
1.8 ms vs 5.0 ms for the gather-table apply on the stock O1 mass matrix;
batched applies amortize both the permutes and the tile reads).

The tiles are dense zero-padded windows (density ~1% — deliberately trading
HBM bytes for the TPU's streaming-read speed; ~350 MB at 56k dofs). Builds
that would exceed ``max_bytes`` return None so callers fall back to the
gather apply.

Role in the reference: dolfin/PETSc CSR matvecs inside the per-step RHS
assembly (ref: src/flowcontrol/flowsolver.py:703-799).
"""
from __future__ import annotations

import logging

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_R = 128  # row-block height = TPU lane width

# HIGH matmul precision: the tile einsum is matmul-shaped, so at DEFAULT
# the MXU truncates the f32 operand values to bf16 (~2^-9 relative) —
# measured on-chip at stock 56k (tools/solve_precision_ab.py). CPU
# ignores the flag.
_PREC = jax.lax.Precision.HIGH


def build_banded(mat, dtype=np.float32, max_bytes: int = 6_000_000_000):
    """Host-side build: CSR -> (device tree, static meta) or None if too big.

    The returned ``tree`` is a dict of device arrays (a pytree safe to put in
    a jitted closure/argument); apply with :func:`banded_matvec`.
    """
    m = sp.csr_matrix(mat)
    n = m.shape[0]
    if m.shape[0] != m.shape[1]:
        raise ValueError("banded apply needs a square operator")
    m.eliminate_zeros()
    perm = np.asarray(reverse_cuthill_mckee(m, symmetric_mode=False))
    mp = m[perm][:, perm].tocsr()
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)

    nb = (n + _R - 1) // _R
    npad = nb * _R
    indptr, indices = mp.indptr, mp.indices
    lo = np.zeros(nb, dtype=np.int64)
    width = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        r0, r1 = b * _R, min((b + 1) * _R, n)
        cols = indices[indptr[r0]:indptr[r1]]
        if len(cols):
            lo[b] = cols.min()
            width[b] = cols.max() + 1 - lo[b]
    # 128-align each window start; W2 covers the worst (offset + width)
    lo_a = (lo // _R) * _R
    w_max = int((lo - lo_a + width).max()) if nb else 1
    w2 = ((w_max + _R - 1) // _R) * _R
    tile_bytes = nb * _R * w2 * np.dtype(dtype).itemsize
    if tile_bytes > max_bytes:
        logger.info(
            "banded build skipped: tiles %.1f GB > cap %.1f GB (n=%d, W=%d)",
            tile_bytes / 1e9, max_bytes / 1e9, n, w2,
        )
        return None

    # Fill the tiles ON DEVICE from COO triplets: the tiles are ~99% zeros,
    # so materializing them host-side and shipping them through the (slow,
    # serialized) device transport would dominate setup — the triplets are
    # ~40x smaller. One one-time scatter builds the dense windows in HBM.
    coo = mp.tocoo()
    rows, cols, vals = coo.row, coo.col, coo.data
    bi = rows // _R
    ri = rows - bi * _R
    ci = cols - lo_a[bi]
    wb = w2 // _R
    win = (lo_a // _R)[:, None] + np.arange(wb)[None, :]  # (nb, wb) row idx
    logger.info(
        "banded operator: n=%d nnz=%d bandwidth=%d W=%d tiles=%.0f MB",
        n, mp.nnz, w_max, w2, tile_bytes / 1e6,
    )
    idx = jnp.asarray(np.stack([bi, ri, ci], axis=1), dtype=jnp.int32)

    @jax.jit
    def fill(idx, vals):
        return jnp.zeros((nb, _R, w2), dtype=dtype).at[
            idx[:, 0], idx[:, 1], idx[:, 2]
        ].set(vals)

    tree = {
        "tiles": fill(idx, jnp.asarray(vals, dtype=dtype)),
        "win": jnp.asarray(win, dtype=jnp.int32),
        "perm": jnp.asarray(perm, dtype=jnp.int32),
        "iperm": jnp.asarray(iperm, dtype=jnp.int32),
    }
    return tree


def banded_matvec(tree, x):
    """y = A x through the banded tiles. Supports leading batch dims."""
    tiles = tree["tiles"]
    nb, r, w2 = tiles.shape
    n = tree["perm"].shape[0]
    batch = x.shape[:-1]
    xp = jnp.take(x, tree["perm"], axis=-1)
    pad = nb * r - n + w2  # window rows may run past the last block
    xpad = jnp.concatenate(
        [xp, jnp.zeros(batch + (pad,), dtype=x.dtype)], axis=-1
    )
    xw = xpad.reshape(batch + (nb + w2 // r, r))
    xwin = jnp.take(xw, tree["win"], axis=-2).reshape(batch + (nb, w2))
    yp = jnp.einsum("brw,...bw->...br", tiles, xwin, precision=_PREC)
    yp = yp.reshape(batch + (nb * r,))[..., :n]
    return jnp.take(yp, tree["iperm"], axis=-1)
