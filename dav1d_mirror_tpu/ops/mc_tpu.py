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
        # 8 shifted multiply-adds over the window (slice views, no
        # secondary gather; int32 VPU ops)
        hsum = win[:, :, 0:uw] * fh[:, 0, None, None]
        for k in range(1, 8):
            hsum = hsum + win[:, :, k:k + uw] * fh[:, k, None, None]
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
        vsum = mid[:, 0:uh] * fv[:, 0, None, None]
        for k in range(1, 8):
            vsum = vsum + mid[:, k:k + uh] * fv[:, k, None, None]
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


# ---------------------------------------------------------------------
# Two-stage MC for the has_h & has_v buckets (the dominant case).
#
# The per-unit (uh+7, uw+7) window gather amplifies HBM-gather traffic
# ~28x over the output pixels and gathers are element-rate-bound on TPU.
# Instead, the horizontal pass runs as FULL-PLANE shifted multiply-adds
# (pure VPU, no gather) once per distinct (ref, filter_row, mx) combo,
# and the per-unit gather shrinks to the (uh+7, uw) mid window. The mid
# values are identical ints (same taps on the same clamped pixels, same
# rounding), so the result stays bit-exact with mc_unit_batch.
# ---------------------------------------------------------------------

_HPAD_L = 15          # covers window-origin x0 >= -(uw+7) after clamping
_HPAD_R = 14          # x0 max = W+6, taps reach W+13


@functools.partial(jax.jit, static_argnums=(2,))
def mc_hplanes(ref_stack, combos, bitdepth):
    """ref_stack: (R, H, W) int32; combos: (C, 3) int32 rows
    (ref, filter_row, mx). Returns (C, H, W+22) int16 mid planes indexed
    by window origin xh = x0 + 15 (x0 in [-15, W+6]); rows unchanged.
    Mid fits int16 by the same argument as the reference's int16 tmp
    (mc_tmpl.c put_8tap mid[])."""
    R, H, W = ref_stack.shape
    ib = _ibits(bitdepth)
    pad = jnp.pad(ref_stack, ((0, 0), (0, 0), (_HPAD_L, _HPAD_R)),
                  mode="edge")
    sel = pad[combos[:, 0]]                                # (C, H, W+29)
    f = jnp.asarray(_SUBPEL)[combos[:, 1], combos[:, 2] - 1]  # (C, 8)
    acc = sel[:, :, 0:W + 22] * f[:, 0, None, None]
    for k in range(1, 8):
        acc = acc + sel[:, :, k:k + W + 22] * f[:, k, None, None]
    mid = (acc + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
    return mid.astype(jnp.int16)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def mc_unit_batch_hv(args, uw: int, uh: int, bitdepth: int, prep: bool):
    """Vertical pass over gathered mid windows. args = (hstack
    (C, H, W+22) int16 from mc_hplanes, slot (B,), oy (B,), ox (B,)
    pre-clamped to [-15, W-1], my (B,), tv (B,) vertical filter type)."""
    hstack, slot, oy, ox, my, tv = args
    H = hstack.shape[1]
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    ys = jnp.clip(oy[:, None] + jnp.arange(uh + 7)[None, :], 0, H - 1)
    xh = (ox + _HPAD_L)[:, None] + jnp.arange(uw)[None, :]
    mid = hstack[slot[:, None, None], ys[:, :, None],
                 xh[:, None, :]].astype(jnp.int32)
    fv = _filters_for(tv, my, uh <= 4)
    # 8 shifted multiply-adds (free slice views; no secondary gather)
    vsum = mid[:, 0:uh, :] * fv[:, 0, None, None]
    for k in range(1, 8):
        vsum = vsum + mid[:, k:k + uh, :] * fv[:, k, None, None]
    if prep:
        return ((vsum + 32) >> 6) - bias
    return jnp.clip((vsum + ((1 << (6 + ib)) >> 1)) >> (6 + ib), 0,
                    (1 << bitdepth) - 1)


def mc_hv_combos(arr, uw):
    """Host-side combo/slot mapping for a has_h&has_v descriptor bucket.
    arr: (B, 6) np int32 (ref, oy, ox, mx, my, f2d). Returns
    (combos (C,3) padded to a multiple of 8, slot (B,), ox_clamped,
    tv (B,))."""
    th = _F2D[arr[:, 5], 0]
    tv = _F2D[arr[:, 5], 1]
    filt_row = np.where(uw <= 4, 3 + (th & 1), th)
    key = np.stack([arr[:, 0], filt_row, arr[:, 3]], axis=1)
    combos, slot = np.unique(key, axis=0, return_inverse=True)
    padded = -(-combos.shape[0] // 8) * 8
    if padded != combos.shape[0]:
        combos = np.concatenate(
            [combos, np.repeat(combos[-1:], padded - combos.shape[0], 0)])
    return (combos.astype(np.int32), slot.astype(np.int32),
            tv.astype(np.int32))


def mc_hv_batch(ref_stack, arr, uw, uh, bitdepth, prep, hcache=None):
    """Two-stage MC for one has_h&has_v bucket; bit-exact with
    mc_unit_batch(..., has_h=True, has_v=True, ...). hcache: optional
    dict keyed by combos bytes to reuse H-plane stacks across buckets.
    On TPU backends the vertical pass runs as the Pallas DMA kernel
    (ops/mc_pallas); elsewhere the XLA gather path below is used."""
    from . import mc_pallas

    W = int(ref_stack.shape[2])
    combos, slot, tv = mc_hv_combos(arr, uw)
    key = combos.tobytes()
    use_pallas = mc_pallas.pallas_available()
    hstack = None if hcache is None else hcache.get(key)
    if hstack is None:
        if use_pallas:
            hs, remap = mc_pallas.mc_hplanes_pallas(ref_stack, combos,
                                                    bitdepth)
            hstack = (mc_pallas.pad_hstack(hs)[0], int(hs.shape[1]),
                      remap)
        else:
            hstack = mc_hplanes(ref_stack, jnp.asarray(combos), bitdepth)
        if hcache is not None:
            hcache[key] = hstack
    if use_pallas:
        hpad, Hh, remap = hstack
        return mc_pallas.mc_vpass_pallas(hpad, Hh, W, remap[slot], arr,
                                         tv, _SUBPEL, uw, uh, bitdepth,
                                         prep)
    ox = np.clip(arr[:, 2], -_HPAD_L, W - 1)
    return mc_unit_batch_hv(
        (hstack, jnp.asarray(slot), jnp.asarray(arr[:, 1]),
         jnp.asarray(ox.astype(np.int32)), jnp.asarray(arr[:, 4]),
         jnp.asarray(tv)), uw, uh, bitdepth, prep)


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
