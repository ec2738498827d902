"""Batched motion compensation on device (JAX/XLA for TPU).

TPU-first design: the host entropy stage decomposes every translational MC
block into fixed-size units (8x8, with 4-wide/4-tall remainder buckets) that
share one subpel phase each, and emits dense descriptor arrays (reference
slot, window origin, subpel phase, filter type). The device then:

  1. gathers (uh+7, uw+7) clamped windows from the stacked reference planes
     (edge emulation == clamped gather, dav1d mc:986-999),
  2. applies the 8-tap separable filters as batched tensor contractions
     (per-unit coefficient rows selected from the subpel filter table),
  3. returns (B, uh, uw) pixels / compound intermediates to be scattered
     into the frame.

Bit-exact with dav1d src/mc_tmpl.c put_8tap:112 / prep_8tap:224 (the four
rounding variants are separate jit specializations selected by host-side
bucketing on (mx != 0, my != 0)). Compound joins (avg/w_avg/mask) are
elementwise batch kernels (mc_tmpl.c:589-641).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tables import TABLES

# (6, 15, 8) subpel filter table; rows 0..2 = 8-tap regular/smooth/sharp,
# 3..4 = 4-tap variants (w <= 4), 5 = bilin
_SUBPEL = np.asarray(TABLES["mc_subpel_filters"], np.int32)

# Filter2d -> (type_h, type_v); see ops/ref/mc.py FILTER_2D
_F2D = np.asarray([[0, 0], [0, 1], [0, 2],
                   [2, 0], [2, 1], [2, 2],
                   [1, 0], [1, 1], [1, 2]], np.int32)


def _ibits(bitdepth):
    return 4 if bitdepth == 8 else 14 - bitdepth


def _filters_for(ftype, subpel, small):
    """Per-unit (B, 8) filter rows. ftype: (B,) 0..2; subpel: (B,) 1..15."""
    row = jnp.where(small, 3 + (ftype & 1), ftype)
    table = jnp.asarray(_SUBPEL)
    return table[row, subpel - 1]


@functools.partial(jax.jit,
                   static_argnums=(1, 2, 3, 4, 5, 6))
def mc_unit_batch(args, uw: int, uh: int, has_h: bool, has_v: bool,
                  bitdepth: int, prep: bool):
    """args = (ref_stack (R, H, W) int32, ref_idx (B,), oy (B,), ox (B,)
    window origins (may be negative; clamped gather), mx (B,), my (B,)
    subpel 1..15, f2d (B,) Filter2d enum).

    Returns (B, uh, uw) int32: pixels (put) or int16-domain tmp (prep)."""
    ref_stack, ref_idx, oy, ox, mx, my, f2d = args
    H, W = ref_stack.shape[1], ref_stack.shape[2]
    B = ref_idx.shape[0]
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    bd_max = (1 << bitdepth) - 1

    win_h = uh + 7 if has_v else uh
    win_w = uw + 7 if has_h else uw
    ys = jnp.clip(oy[:, None] + jnp.arange(win_h)[None, :], 0, H - 1)
    xs = jnp.clip(ox[:, None] + jnp.arange(win_w)[None, :], 0, W - 1)
    win = ref_stack[ref_idx[:, None, None], ys[:, :, None], xs[:, None, :]]
    win = win.astype(jnp.int32)

    th = _F2D[:, 0]
    tv = _F2D[:, 1]
    th = jnp.asarray(th)[f2d]
    tv = jnp.asarray(tv)[f2d]

    if has_h:
        fh = _filters_for(th, mx, uw <= 4)  # (B, 8)
        # (B, win_h, uw, 8) windows x taps -> einsum
        idx = jnp.arange(uw)[:, None] + jnp.arange(8)[None, :]
        sl = win[:, :, idx]  # (B, win_h, uw, 8)
        hsum = jnp.einsum("bywk,bk->byw", sl, fh,
                          preferred_element_type=jnp.int32)
        if has_v:
            mid = (hsum + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
        else:
            if prep:
                return ((hsum + ((1 << (6 - ib)) >> 1)) >> (6 - ib)) - bias
            irnd = 32 + ((1 << (6 - ib)) >> 1)
            return jnp.clip((hsum + irnd) >> 6, 0, bd_max)
    else:
        mid = win

    if has_v:
        fv = _filters_for(tv, my, uh <= 4)
        idx = jnp.arange(uh)[:, None] + jnp.arange(8)[None, :]
        sl = mid[:, idx]  # (B, uh, 8, uw)
        vsum = jnp.einsum("bykw,bk->byw", sl, fv,
                          preferred_element_type=jnp.int32)
        if has_h:
            if prep:
                return ((vsum + 32) >> 6) - bias
            return jnp.clip((vsum + ((1 << (6 + ib)) >> 1)) >> (6 + ib),
                            0, bd_max)
        if prep:
            return ((vsum + ((1 << (6 - ib)) >> 1)) >> (6 - ib)) - bias
        return jnp.clip((vsum + 32) >> 6, 0, bd_max)

    # copy path
    if prep:
        return (win[:, :uh, :uw] << ib) - bias
    return win[:, :uh, :uw]


@functools.partial(jax.jit, static_argnums=(2,))
def avg_batch(tmp1, tmp2, bitdepth):
    """dav1d mc_tmpl.c avg:589 on (B, h, w) int32 tmp pairs."""
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    rnd = (1 << ib) + bias * 2
    return jnp.clip((tmp1 + tmp2 + rnd) >> (ib + 1), 0,
                    (1 << bitdepth) - 1)


@functools.partial(jax.jit, static_argnums=(3,))
def w_avg_batch(tmp1, tmp2, weight, bitdepth):
    """dav1d mc_tmpl.c w_avg:604; weight: (B, 1, 1) int32."""
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    rnd = (8 << ib) + bias * 16
    return jnp.clip((tmp1 * weight + tmp2 * (16 - weight) + rnd)
                    >> (ib + 4), 0, (1 << bitdepth) - 1)


@functools.partial(jax.jit, static_argnums=(3,))
def mask_batch(tmp1, tmp2, m, bitdepth):
    """dav1d mc_tmpl.c mask:620; m: (B, h, w) int32 in [0, 64]."""
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    rnd = (32 << ib) + bias * 64
    return jnp.clip((tmp1 * m + tmp2 * (64 - m) + rnd) >> (ib + 6), 0,
                    (1 << bitdepth) - 1)


def scatter_units(plane, units, ys, xs, uh, uw):
    """Write (B, uh, uw) units into plane at top-left (ys, xs) (disjoint)."""
    B = units.shape[0]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    return plane.at[yy, xx].set(units.astype(plane.dtype))


def gather_units(plane, ys, xs, uh, uw):
    """Read (B, uh, uw) units from plane at top-left (ys, xs)."""
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    return plane[yy, xx]


def scatter_add_units(plane, units, ys, xs, uh, uw, bitdepth):
    """Residual add with pixel clip at unit positions (disjoint units)."""
    B = units.shape[0]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    cur = plane[yy, xx].astype(jnp.int32)
    out = jnp.clip(cur + units, 0, (1 << bitdepth) - 1)
    return plane.at[yy, xx].set(out.astype(plane.dtype))
