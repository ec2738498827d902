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


def itx_families(n: int) -> tuple:
    """1D transform families that exist at line length n (dav1d
    src/itx_1d.c: adst tops out at 16, identity at 32, only dct has 64).
    The order is the selector index contract of the *_multi kernels."""
    if n == 64:
        return ("dct",)
    if n == 32:
        return ("dct", "identity")
    return ("dct", "adst", "flipadst", "identity")


def itx_multi_sel(tx: int, txtp: int) -> tuple[int, int]:
    """(row_sel, col_sel) family indices for a (tx, txtp) pair, the
    per-block data consumed by _residual_multi_core."""
    w, h, _ = TX_INFO[tx]
    row_fam, col_fam = TXTYPE_TO_1D[txtp]
    return (itx_families(w).index(row_fam),
            itx_families(h).index(col_fam))


def _select_variants(variants, sel, reps, n_fam, xp):
    """variants: list of (n_out, B*lines) arrays, one per 1D family;
    sel: (B,) family index per block; reps: lines per block along the
    flattened column axis. Computing every family then selecting keeps
    the kernel static over txtp — the (tx, txtp) bucket explosion
    (dav1d's itxfm_add[19][17] table) becomes ONE program per tx size,
    which is what the signature-stable fused frame program needs. The
    ≤4x extra butterflies are VPU-cheap next to a per-type compile."""
    stacked = xp.stack(variants)                      # (F, n_out, B*L)
    sel_cols = xp.repeat(sel.astype(xp.int32), reps)  # (B*L,)
    onehot = sel_cols[None, :] == xp.arange(n_fam)[:, None]
    return xp.sum(xp.where(onehot[:, None, :], stacked, 0), axis=0)


def _residual_multi_core(coefs, row_sel, col_sel, tx: int, bitdepth: int,
                         xp):
    """Like _residual_core but with the transform TYPE as per-block
    data: row_sel/col_sel are (B,) indices into itx_families(w/h).
    Bit-exact: each variant is the exact butterfly network; selection
    doesn't change arithmetic. WHT (lossless 4x4) is not covered —
    it stays a dedicated bucket."""
    w, h, shift = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    B = coefs.shape[0]
    assert coefs.shape[1:] == (sh, sw), (coefs.shape, (sh, sw))
    rnd = (1 << shift) >> 1
    row_fams = itx_families(w)
    col_fams = itx_families(h)
    row_min, row_max, col_min, col_max = clip_ranges(bitdepth)

    c = coefs.astype(xp.int32)
    if (w * 2 == h) or (h * 2 == w):
        c = (c * 181 + 128) >> 8

    # row pass along x; flattened columns are (b, y) pairs
    arr = xp.transpose(c, (2, 0, 1)).reshape(sw, B * sh)
    if len(row_fams) == 1:
        tmp = _apply_1d(arr, get_1d_fn(row_fams[0], w), row_min, row_max,
                        w, xp)
    else:
        tmp = _select_variants(
            [_apply_1d(arr, get_1d_fn(f, w), row_min, row_max, w, xp)
             for f in row_fams], row_sel, sh, len(row_fams), xp)

    tmp = xp.clip((tmp + rnd) >> shift, col_min, col_max)

    # col pass along y; flattened columns are (b, x) pairs
    arr = xp.transpose(tmp.reshape(w, B, sh), (2, 1, 0)).reshape(sh, B * w)
    if len(col_fams) == 1:
        out = _apply_1d(arr, get_1d_fn(col_fams[0], h), col_min, col_max,
                        h, xp)
    else:
        out = _select_variants(
            [_apply_1d(arr, get_1d_fn(f, h), col_min, col_max, h, xp)
             for f in col_fams], col_sel, w, len(col_fams), xp)

    out = (out + 8) >> 4
    return xp.transpose(out.reshape(h, B, w), (1, 0, 2))


@functools.partial(jax.jit, static_argnums=(3, 4))
def itx_residual_multi(coefs: jax.Array, row_sel: jax.Array,
                       col_sel: jax.Array, tx: int, bitdepth: int):
    return _residual_multi_core(coefs, row_sel, col_sel, tx, bitdepth,
                                jnp)


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
