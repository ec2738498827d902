"""Loop restoration on device (JAX/XLA): wiener + self-guided, bit-exact.

TPU formulation: each (stripe, unit) region filters independently from the
pre-LR snapshot + pre-CDEF boundary rows. We batch all stripe-units of equal
geometry: the 7-tap separable wiener is shifted-adds over a padded stripe
tensor (VPU); SGR uses cumulative-sum box filters. The host supplies padded
per-unit stripe tensors (built from the plan), keeping the device code free
of ragged control flow.

Bit-exact vs ops/ref/looprestoration.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tables import TABLES

SGR_X_BY_X = np.asarray(TABLES["sgr_x_by_x"], np.int32)


@functools.partial(jax.jit, static_argnames=("w", "h"))
def pad_stripes_tpu(pre_lr, pre, xs, ys, edges, w: int, h: int):
    """Device stripe padding: batched (h+6, w+6) windows gathered from
    the pre-LR plane (body) and the pre-CDEF plane (top/bottom boundary
    rows, dav1d's lr_copy semantics — see ops/ref/looprestoration
    pad_stripe / models/tpu_filters._pad_stripe_np for the host spec).
    Edge replication is expressed as clamped gather indices, so the
    whole frame's LR stays device-resident.

    pre_lr/pre: (H, W) int32 planes. xs/ys: (B,) unit origins.
    edges: (B,) LR_HAVE_* masks. Returns (B, h+6, w+6)."""
    ph, pw = pre_lr.shape
    have_l = (edges & 1).astype(jnp.int32)       # LR_HAVE_LEFT
    have_r = ((edges >> 1) & 1).astype(jnp.int32)
    have_t = ((edges >> 2) & 1).astype(jnp.int32)
    have_b = ((edges >> 3) & 1).astype(jnp.int32)

    c = jnp.arange(w + 6)[None, :]               # (1, w+6)
    lo = -3 * have_l[:, None]
    hi = (w - 1) + 3 * have_r[:, None]
    col = xs[:, None] + jnp.clip(c - 3, lo, hi)
    col = jnp.clip(col, 0, pw - 1)               # (B, w+6)

    r = jnp.arange(h + 6)[None, :]               # (1, h+6)
    # body rows (and top/bottom replication when boundary rows absent)
    row_lr = ys[:, None] + jnp.clip(r - 3, 0, h - 1)
    # boundary rows from the pre-CDEF plane:
    #   r 0,1 -> y-2 ; r 2 -> y-1 ; r h+3 -> y+h ; r h+4,h+5 -> y+h+1
    row_pre = jnp.where(r < 3,
                        ys[:, None] - jnp.where(r < 2, 2, 1),
                        ys[:, None] + h + jnp.where(r > h + 3, 1, 0))
    row_pre = jnp.clip(row_pre, 0, pre.shape[0] - 1)
    use_pre = ((r < 3) & (have_t[:, None] == 1)) | \
              ((r >= h + 3) & (have_b[:, None] == 1))   # (B, h+6)

    body = pre_lr[row_lr[:, :, None], col[:, None, :]]
    bound = pre[row_pre[:, :, None], col[:, None, :]]
    return jnp.where(use_pre[:, :, None], bound, body)


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def wiener_batch_tpu(padded, fh, fv, w, h, bitdepth):
    """padded: (B, h+6, w+6) int32 stripes; fh/fv: (B, 7) int32 filters.
    Returns (B, h, w) filtered pixels."""
    round_bits_h = 3 + (bitdepth == 12) * 2
    rnd_h = 1 << (round_bits_h - 1)
    clip_limit = 1 << (bitdepth + 1 + 7 - round_bits_h)
    base = 1 << (bitdepth + 6)

    hor = jnp.zeros(padded.shape[:1] + (h + 6, w), jnp.int32)
    for k in range(7):
        hor = hor + padded[:, :, k:k + w] * fh[:, k, None, None]
    hor = jnp.clip((hor + base + rnd_h) >> round_bits_h, 0, clip_limit - 1)

    round_bits_v = 11 - (bitdepth == 12) * 2
    rnd_v = 1 << (round_bits_v - 1)
    round_offset = 1 << (bitdepth + round_bits_v - 1)
    out = jnp.zeros(padded.shape[:1] + (h, w), jnp.int32)
    for k in range(7):
        out = out + hor[:, k:k + h] * fv[:, k, None, None]
    return jnp.clip((out - round_offset + rnd_v) >> round_bits_v, 0,
                    (1 << bitdepth) - 1)


def _boxsum_b(padded, rad):
    """padded: (B, H, W) int32. Returns (sum, sumsq) of (2rad+1)^2 boxes;
    result[b, y, x] is the box centred at padded[b, y+rad, x+rad]."""
    a = padded.astype(jnp.int32)
    a2 = a * a
    n = 2 * rad + 1

    def box(v):
        cs = jnp.cumsum(v, axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        vs = cs[:, n:] - cs[:, :-n]
        cs2 = jnp.cumsum(vs, axis=2)
        cs2 = jnp.concatenate([jnp.zeros_like(cs2[:, :, :1]), cs2], axis=2)
        return cs2[:, :, n:] - cs2[:, :, :-n]
    return box(a), box(a2)


@functools.partial(jax.jit,
                   static_argnames=("w", "h", "n", "bitdepth"))
def selfguided_batch_tpu(padded, s, w, h, n, bitdepth):
    """padded: (B, h+6, w+6); s: (B,) sgr strength. Returns (B, h, w) int32
    pre-weight filter outputs (dav1d selfguided_filter semantics)."""
    sgr_one_by_x = 164 if n == 25 else 455
    bd_m8 = bitdepth - 8
    rad = 2 if n == 25 else 1
    step = 2 if n == 25 else 1

    box_s, box_s2 = _boxsum_b(padded, rad)
    # centre grid: unit coords [-1, h+1) x [-1, w+1); padded centre (2+j, 2+i)
    H2, W2 = h + 2, w + 2
    sv = box_s[:, 2 - rad:2 - rad + H2, 2 - rad:2 - rad + W2]
    sv2 = box_s2[:, 2 - rad:2 - rad + H2, 2 - rad:2 - rad + W2]

    a = (sv2 + ((1 << (2 * bd_m8)) >> 1)) >> (2 * bd_m8)
    b = (sv + ((1 << bd_m8) >> 1)) >> bd_m8
    pval = jnp.maximum(a * n - b * b, 0).astype(jnp.uint32)
    z = (pval * s[:, None, None].astype(jnp.uint32) + (1 << 19)) >> 20
    x = jnp.asarray(SGR_X_BY_X)[jnp.minimum(z, 255).astype(jnp.int32)]
    # x * sum * one_by_x can exceed int32 at 12bpc (matches the reference's
    # unsigned arithmetic); compute in uint32 then narrow
    A = ((x.astype(jnp.uint32) * sv.astype(jnp.uint32) * sgr_one_by_x +
          (1 << 11)) >> 12).astype(jnp.int32)
    B = x

    if step == 2:
        # A/B only computed on every other row (centre rows -1, 1, 3, ...)
        keep = (jnp.arange(H2) % 2) == 0
        A = jnp.where(keep[None, :, None], A, 0)
        B = jnp.where(keep[None, :, None], B, 0)

    src = padded[:, 3:3 + h, 3:3 + w].astype(jnp.int32)

    def nb(P, dy, dx):
        return P[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    if n == 25:
        six_b = ((nb(B, -1, 0) + nb(B, 1, 0)) * 6 +
                 (nb(B, -1, -1) + nb(B, 1, -1) +
                  nb(B, -1, 1) + nb(B, 1, 1)) * 5)
        six_a = ((nb(A, -1, 0) + nb(A, 1, 0)) * 6 +
                 (nb(A, -1, -1) + nb(A, 1, -1) +
                  nb(A, -1, 1) + nb(A, 1, 1)) * 5)
        even = (six_a - six_b * src + (1 << 8)) >> 9
        five_b = nb(B, 0, 0) * 6 + (nb(B, 0, -1) + nb(B, 0, 1)) * 5
        five_a = nb(A, 0, 0) * 6 + (nb(A, 0, -1) + nb(A, 0, 1)) * 5
        odd = (five_a - five_b * src + (1 << 7)) >> 8
        rows_even = (jnp.arange(h) % 2) == 0
        # last row when h is odd uses the even (six-neighbour) formula
        return jnp.where(rows_even[None, :, None], even, odd)
    else:
        eight_b = ((nb(B, 0, 0) + nb(B, 0, -1) + nb(B, 0, 1) +
                    nb(B, -1, 0) + nb(B, 1, 0)) * 4 +
                   (nb(B, -1, -1) + nb(B, 1, -1) +
                    nb(B, -1, 1) + nb(B, 1, 1)) * 3)
        eight_a = ((nb(A, 0, 0) + nb(A, 0, -1) + nb(A, 0, 1) +
                    nb(A, -1, 0) + nb(A, 1, 0)) * 4 +
                   (nb(A, -1, -1) + nb(A, 1, -1) +
                    nb(A, -1, 1) + nb(A, 1, 1)) * 3)
        return (eight_a - eight_b * src + (1 << 8)) >> 9


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth", "kind"))
def sgr_batch_tpu(padded, cur, s0, s1, w0, w1, w, h, bitdepth, kind):
    """kind: 0=5x5, 1=3x3, 2=mix. cur: (B, h, w) current (post-CDEF) pixels;
    returns filtered (B, h, w)."""
    v = jnp.zeros(cur.shape, jnp.int32)
    if kind in (0, 2):
        d0 = selfguided_batch_tpu(padded, s0, w, h, 25, bitdepth)
        v = v + w0[:, None, None] * d0
    if kind in (1, 2):
        d1 = selfguided_batch_tpu(padded, s1, w, h, 9, bitdepth)
        v = v + w1[:, None, None] * d1
    out = cur + ((v + (1 << 10)) >> 11)
    return jnp.clip(out, 0, (1 << bitdepth) - 1).astype(jnp.int32)
