"""Batched inverse transforms on device (JAX/XLA for TPU).

The host entropy stage buckets tx blocks by (tx_size, tx_type) and emits dense
int32 coefficient tensors of shape (B, sh, sw); this module turns each bucket
into residual tensors (B, h, w) with bit-exact AV1 integer arithmetic, fully
vectorized over the batch (each 1D butterfly stage is an elementwise VPU op
over B*line vectors; there is no per-block control flow, so XLA can tile and
fuse the whole DAG).

The butterfly networks themselves live in `itx_1d.py` and are shared with the
NumPy reference — the JAX path is the same code traced over jnp arrays.

Reference parity: dav1d `src/itx_tmpl.c:40-100` (composer semantics),
`src/itx_1d.c` (butterflies). The dc-only fast path is not special-cased:
for spec-compliant coefficient magnitudes the full path is bit-identical, and
a uniform path is what the TPU wants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .itx_1d import get_1d_fn, iwht4
from .itx_meta import TX_INFO, TXTYPE_TO_1D, WHT_WHT
from .ref.itx import clip_ranges


def _apply_1d(arr, fn, mn, mx, n_out, xp=jnp):
    """arr: (n_in, M) int32 -> (n_out, M), applying fn along axis 0."""
    vecs = [arr[k] for k in range(arr.shape[0])]
    out = fn(vecs, mn, mx)
    assert len(out) == n_out
    return xp.stack(out, axis=0)


def _residual_core(coefs, tx: int, txtp: int, bitdepth: int, xp):
    """coefs: (B, sh, sw) int32, de-transposed layout coefs[b, y, x].
    Returns (B, h, w) int32 residuals (to be added + pixel-clipped by the
    reconstruction driver). The same butterflies serve the jitted device
    path (xp=jnp) and the batched host path (xp=np)."""
    w, h, shift = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    B = coefs.shape[0]
    assert coefs.shape[1:] == (sh, sw), (coefs.shape, (sh, sw))
    rnd = (1 << shift) >> 1

    if txtp == WHT_WHT:
        c = coefs.astype(xp.int32) >> 2
        # row pass along x, batched over (B, y)
        arr = xp.transpose(c, (2, 0, 1)).reshape(4, B * 4)
        tmp = xp.stack(iwht4([arr[k] for k in range(4)]), axis=0)
        # tmp: (x, B, y) -> col pass along y
        arr = xp.transpose(tmp.reshape(4, B, 4), (2, 1, 0)).reshape(4, B * 4)
        out = xp.stack(iwht4([arr[k] for k in range(4)]), axis=0)
        return xp.transpose(out.reshape(4, B, 4), (1, 0, 2))

    is_rect2 = (w * 2 == h) or (h * 2 == w)
    row_fam, col_fam = TXTYPE_TO_1D[txtp]
    row_min, row_max, col_min, col_max = clip_ranges(bitdepth)

    c = coefs.astype(xp.int32)
    if is_rect2:
        c = (c * 181 + 128) >> 8

    # row pass: transform along x; batch over (B, sh)
    arr = xp.transpose(c, (2, 0, 1)).reshape(sw, B * sh)
    tmp = _apply_1d(arr, get_1d_fn(row_fam, w), row_min, row_max, w, xp)

    tmp = xp.clip((tmp + rnd) >> shift, col_min, col_max)

    # col pass: transform along y; batch over (B, w)
    arr = xp.transpose(tmp.reshape(w, B, sh), (2, 1, 0)).reshape(sh, B * w)
    out = _apply_1d(arr, get_1d_fn(col_fam, h), col_min, col_max, h, xp)

    out = (out + 8) >> 4
    return xp.transpose(out.reshape(h, B, w), (1, 0, 2))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def itx_residual(coefs: jax.Array, tx: int, txtp: int, bitdepth: int):
    return _residual_core(coefs, tx, txtp, bitdepth, jnp)


def itx_residual_np(coefs, tx: int, txtp: int, bitdepth: int):
    """Batched host residuals (numpy, same butterflies)."""
    return _residual_core(np.asarray(coefs, np.int32), tx, txtp,
                          bitdepth, np)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def itx_add(pred: jax.Array, coefs: jax.Array, tx: int, txtp: int,
            bitdepth: int):
    """pred: (B, h, w) pixel-domain int32/uint; returns reconstructed pixels
    clipped to [0, 2^bitdepth - 1] as int32."""
    res = itx_residual(coefs, tx, txtp, bitdepth)
    return jnp.clip(pred.astype(jnp.int32) + res, 0, (1 << bitdepth) - 1)
