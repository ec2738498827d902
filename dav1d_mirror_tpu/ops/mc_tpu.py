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
    # quantized padding (8, 16, 24, 40, 64, 96, 144, ... — 1.5x steps
    # kept multiples of 8): the H-plane stack's leading dim stays in a
    # log-sized set of shapes so XLA programs are reused across frames,
    # while the pad overhead (wasted full-plane H filters) stays <= 50%
    padded = 8
    while padded < combos.shape[0]:
        padded = (padded + (padded >> 1) + 7) & ~7
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


@functools.partial(jax.jit, static_argnums=(4, 5))
def scatter_units(plane, units, ys, xs, uh, uw):
    """Write (B, uh, uw) units into plane at top-left (ys, xs) (disjoint).

    Padding protocol: batch entries whose ys is out of bounds (PAD_OOB)
    are dropped entirely by XLA's scatter semantics — shape-stabilizing
    pad rows are exact no-ops."""
    B = units.shape[0]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    return plane.at[yy, xx].set(units.astype(plane.dtype))


def gather_units(plane, ys, xs, uh, uw):
    """Read (B, uh, uw) units from plane at top-left (ys, xs)."""
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    return plane[yy, xx]


# Sentinel row origin marking shape-padding batch entries: far enough out
# of bounds that every scatter index of the unit is dropped, small enough
# that index arithmetic cannot overflow int32.
PAD_OOB = 1 << 20


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def scatter_add_units(plane, units, ys, xs, uh, uw, bitdepth):
    """Residual add with pixel clip at unit positions (disjoint units)."""
    B = units.shape[0]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    cur = plane[yy, xx].astype(jnp.int32)
    out = jnp.clip(cur + units, 0, (1 << bitdepth) - 1)
    return plane.at[yy, xx].set(out.astype(plane.dtype))


# ---------------------------------------------------------------------
# Fused glue for the frame recon driver (models/tpu_inter).  Each helper
# collapses what would otherwise be a chain of eager ops into ONE
# compiled program per shape class — on a tunneled TPU every dispatched
# op costs fixed host latency and (cold) a compile, so the driver's
# steady state must be a few large dispatches per bucket, not dozens.
# ---------------------------------------------------------------------
@jax.jit
def set_slots(buf, slots, vals):
    """buf[slots] = vals (duplicate slots carry identical values)."""
    return buf.at[slots].set(vals)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def scatter_slot_units(buf, base, vals, uh: int, uw: int, row_w: int):
    """Write (B, uh, uw) vals at flat offsets `base` into the flattened
    (N, bhp, bwp) slot buffer (sub-rect writes within compound slots)."""
    shp = buf.shape
    fi = (base[:, None, None] +
          jnp.arange(uh)[None, :, None] * row_w +
          jnp.arange(uw)[None, None, :])
    return buf.reshape(-1).at[fi.reshape(-1)].set(
        vals.reshape(-1)).reshape(shp)


@functools.partial(jax.jit, static_argnums=(5,))
def comp_join_wavg(out, tmp0, tmp1, sl, w, bitdepth: int):
    """(weighted-)average join for slots sl; w: (B,1,1) dist weights
    (8 = plain avg — same rounding, dav1d mc_tmpl.c avg:585)."""
    return out.at[sl].set(w_avg_batch(tmp0[sl], tmp1[sl], w, bitdepth))


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def comp_join_wmask(out, tmp0, tmp1, sl, sgn, ss_hor: int, ss_ver: int,
                    bitdepth: int):
    """seg-mask join, luma: derives the sign-ordered operands, computes
    the w_mask and returns (updated out, chroma-subsampled masks)."""
    t0, t1 = tmp0[sl], tmp1[sl]
    a = jnp.where(sgn[:, None, None] == 0, t0, t1)
    b = jnp.where(sgn[:, None, None] == 0, t1, t0)
    res, cm = w_mask_batch(a, b, sgn, ss_hor, ss_ver, bitdepth)
    return out.at[sl].set(res), cm


@functools.partial(jax.jit, static_argnums=(6,))
def comp_join_mask(out, tmp0, tmp1, sl, sgn, masks, bitdepth: int):
    """wedge / seg-chroma masked join for slots sl."""
    t0, t1 = tmp0[sl], tmp1[sl]
    a = jnp.where(sgn[:, None, None] == 0, t0, t1)
    b = jnp.where(sgn[:, None, None] == 0, t1, t0)
    return out.at[sl].set(mask_batch(a, b, masks, bitdepth))


# ---------------------------------------------------------------------
# Affine warp: batched 8x8 sub-blocks (dav1d src/mc_tmpl.c
# warp_affine_8x8:758 / warp_affine_8x8t:793). Each unit gathers a
# clamped (15,15) source window; the per-pixel filter rows come from the
# warp filter table indexed by the affine phase (tmx/tmy), evaluated as
# batched table gathers + shifted multiply-adds.
# ---------------------------------------------------------------------
_WARP = np.asarray(TABLES["mc_warp_filter"], np.int32)  # (193, 8)


@functools.partial(jax.jit, static_argnums=(2, 3))
def warp8x8_batch(ref_stack, args, bitdepth, prep):
    """args: (B, 10) int32 rows [ref, oy, ox, mx, my, a, b, c, d, pad]
    where (oy, ox) is the window origin (dy-3, dx-3) and mx/my the
    per-unit phase bases. Returns (B, 8, 8): pixels or prep tmp."""
    ref_idx = args[:, 0]
    oy, ox = args[:, 1], args[:, 2]
    mx, my = args[:, 3], args[:, 4]
    al, be, ga, de = args[:, 5], args[:, 6], args[:, 7], args[:, 8]
    H, W = ref_stack.shape[1], ref_stack.shape[2]
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    bd_max = (1 << bitdepth) - 1
    wf = jnp.asarray(_WARP)

    ys = jnp.clip(oy[:, None] + jnp.arange(15)[None, :], 0, H - 1)
    xs = jnp.clip(ox[:, None] + jnp.arange(15)[None, :], 0, W - 1)
    win = ref_stack[ref_idx[:, None, None], ys[:, :, None],
                    xs[:, None, :]].astype(jnp.int32)

    yv = jnp.arange(15, dtype=jnp.int32)[None, :, None]
    xv = jnp.arange(8, dtype=jnp.int32)[None, None, :]
    # horizontal: tmx(y, x) = mx + x*alpha + y*beta
    tmx = mx[:, None, None] + xv * al[:, None, None] + \
        yv * be[:, None, None]
    fh = wf[64 + ((tmx + 512) >> 10)]            # (B, 15, 8, 8)
    hsum = fh[..., 0] * win[:, :, 0:8]
    for k in range(1, 8):
        hsum = hsum + fh[..., k] * win[:, :, k:k + 8]
    mid = (hsum + ((1 << (7 - ib)) >> 1)) >> (7 - ib)   # (B, 15, 8)

    yv8 = jnp.arange(8, dtype=jnp.int32)[None, :, None]
    tmy = my[:, None, None] + xv * ga[:, None, None] + \
        yv8 * de[:, None, None]
    fv = wf[64 + ((tmy + 512) >> 10)]            # (B, 8, 8, 8)
    vsum = fv[..., 0] * mid[:, 0:8]
    for k in range(1, 8):
        vsum = vsum + fv[..., k] * mid[:, k:k + 8]
    if prep:
        return ((vsum + 64) >> 7) - bias
    return jnp.clip((vsum + ((1 << (7 + ib)) >> 1)) >> (7 + ib), 0,
                    bd_max)


# ---------------------------------------------------------------------
# masked compound joins (dav1d mc_tmpl.c mask:620 / w_mask:683) and
# OBMC blends (blend_v:655 / blend_h:668)
# ---------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def w_mask_batch(tmp1, tmp2, sign, ss_hor: int, ss_ver: int,
                 bitdepth: int):
    """tmp1/tmp2: (B, h, w) prep-domain (tmp1 = mask_sign side).
    Returns (pixels (B, h, w), chroma mask (B, h>>ssv, w>>ssh))."""
    ib = _ibits(bitdepth)
    sh = ib + 6
    bias = 0 if bitdepth == 8 else 8192
    rnd = (32 << ib) + bias * 64
    mask_sh = bitdepth + ib - 4
    mask_rnd = 1 << (mask_sh - 5)
    t1 = tmp1.astype(jnp.int32)
    t2 = tmp2.astype(jnp.int32)
    m = jnp.minimum(38 + ((jnp.abs(t1 - t2) + mask_rnd) >> mask_sh), 64)
    dst = jnp.clip((t1 * m + t2 * (64 - m) + rnd) >> sh, 0,
                   (1 << bitdepth) - 1).astype(jnp.int32)
    if ss_hor:
        mpair = m[:, :, 0::2] + m[:, :, 1::2]
        if ss_ver:
            mm = (mpair[:, 0::2] + mpair[:, 1::2] + 2 -
                  sign[:, None, None]) >> 2
        else:
            mm = (mpair + 1 - sign[:, None, None]) >> 1
    else:
        mm = m
    return dst, mm.astype(jnp.int32)


_OBMC_MASKS = np.asarray(TABLES["obmc_masks"], np.int32)  # (64,)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def obmc_blend_batch(plane, laps, ys, xs, lap_h: int, lap_w: int,
                     region: int, vert: bool):
    """Blend (B, lap_h, lap_w) lap predictions into the plane at
    (ys, xs) (dav1d blend_v:655 / blend_h:668). vert=True: left-
    neighbour laps, mask over the first 3*region/4 columns (region ==
    lap_w); else top-neighbour laps, mask over the first 3*region/4
    rows (region == the blend area height, which can exceed lap_h's
    source rows never used)."""
    if vert:
        ww = (region * 3) >> 2
        m = np.zeros((1, 1, lap_w), np.int32)
        m[0, 0, :ww] = _OBMC_MASKS[region:region + ww]
    else:
        hh = (region * 3) >> 2
        m = np.zeros((1, lap_h, 1), np.int32)
        m[0, :hh, 0] = _OBMC_MASKS[region:region + hh]
    m = jnp.asarray(m)
    reg = gather_units(plane, ys, xs, lap_h, lap_w)
    out = (reg * (64 - m) + laps * m + 32) >> 6
    return scatter_units(plane, out, ys, xs, lap_h, lap_w)


# ---------------------------------------------------------------------
# scaled-reference MC (dav1d mc_tmpl.c put/prep_8tap_scaled:172/287):
# per-pixel source stepping expressed as closed-form index/phase arrays
# (xoff(x) = (posx_frac + x*dx) >> 10 etc.) over a clamped window gather.
# ---------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def mc_scaled_batch(ref_stack, args, uw: int, uh: int, win_w: int,
                    win_h: int, bitdepth: int, prep: bool):
    """args: (B, 9) [ref, top, left, mxf, myf, dx, dy, f2d, pad]; the
    window is gathered at (top-3, left-3) size (win_h, win_w);
    mxf/myf = pos & 0x3FF. Returns (B, uh, uw)."""
    ref_idx = args[:, 0]
    top, left = args[:, 1], args[:, 2]
    mxf, myf = args[:, 3], args[:, 4]
    dx, dy = args[:, 5], args[:, 6]
    f2d = args[:, 7]
    H, W = ref_stack.shape[1], ref_stack.shape[2]
    B = args.shape[0]
    ib = _ibits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    irnd = (1 << ib) >> 1
    bd_max = (1 << bitdepth) - 1

    ys = jnp.clip(top[:, None] - 3 + jnp.arange(win_h)[None, :], 0, H - 1)
    xs = jnp.clip(left[:, None] - 3 + jnp.arange(win_w)[None, :], 0,
                  W - 1)
    win = ref_stack[ref_idx[:, None, None], ys[:, :, None],
                    xs[:, None, :]].astype(jnp.int32)

    th = jnp.asarray(_F2D[:, 0])[f2d]
    tv = jnp.asarray(_F2D[:, 1])[f2d]

    # ---- horizontal pass: mid (B, win_h, uw) ----
    x = jnp.arange(uw, dtype=jnp.int32)[None, :]
    phx = mxf[:, None] + x * dx[:, None]          # (B, uw)
    xoff = phx >> 10
    subx = (phx & 0x3FF) >> 6
    fh = _filters_for(jnp.repeat(th[:, None], uw, 1).reshape(-1),
                      jnp.maximum(subx, 1).reshape(-1),
                      uw <= 4).reshape(B, uw, 8)
    ids = (xoff[:, None, :, None] +
           jnp.arange(8, dtype=jnp.int32)[None, None, None, :])
    ids = jnp.clip(ids, 0, win_w - 1)
    taps = jnp.take_along_axis(
        win,
        jnp.broadcast_to(ids.reshape(B, 1, uw * 8), (B, win_h, uw * 8)),
        axis=2).reshape(B, win_h, uw, 8)
    filt = jnp.sum(taps * fh[:, None, :, :], axis=3)
    filt = (filt + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
    copy = taps[..., 3] << ib
    mid = jnp.where((subx == 0)[:, None, :], copy, filt)

    # ---- vertical pass ----
    y = jnp.arange(uh, dtype=jnp.int32)[None, :]
    phy = myf[:, None] + y * dy[:, None]
    yoff = phy >> 10
    suby = (phy & 0x3FF) >> 6
    fv = _filters_for(jnp.repeat(tv[:, None], uh, 1).reshape(-1),
                      jnp.maximum(suby, 1).reshape(-1),
                      uh <= 4).reshape(B, uh, 8)
    idsv = (yoff[:, :, None] +
            jnp.arange(8, dtype=jnp.int32)[None, None, :])
    idsv = jnp.clip(idsv, 0, win_h - 1)
    tapsv = jnp.take_along_axis(
        mid,
        jnp.broadcast_to(idsv.reshape(B, uh * 8, 1), (B, uh * 8, uw)),
        axis=1).reshape(B, uh, 8, uw)
    vfilt = jnp.sum(tapsv * fv[:, :, :, None], axis=2)
    vcopy = tapsv[:, :, 3, :]
    if prep:
        out = jnp.where((suby == 0)[:, :, None], vcopy - bias,
                        ((vfilt + 32) >> 6) - bias)
    else:
        out = jnp.where(
            (suby == 0)[:, :, None],
            jnp.clip((vcopy + irnd) >> ib, 0, bd_max),
            jnp.clip((vfilt + ((1 << (6 + ib)) >> 1)) >> (6 + ib), 0,
                     bd_max))
    return out


# ---------------------------------------------------------------------
# horizontal super-res resample (dav1d src/mc_tmpl.c resize:877).
# step/mx0 are frame constants, so the per-output-pixel source indices
# and filter rows are STATIC: the kernel reduces to one static gather +
# an 8-tap contraction.
# ---------------------------------------------------------------------
_RESIZE = np.asarray(TABLES["resize_filter"], np.int32)  # (64, 8)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def resize_plane_tpu(src, out_w: int, src_w: int, step: int, mx0: int,
                     bitdepth: int):
    """src: (h, >= src_w) int32. Returns (h, out_w) pixels."""
    xs = np.arange(out_w, dtype=np.int64)
    phase = mx0 + xs * step
    src_x = -1 + (phase >> 14)
    fidx = ((phase & 0x3FFF) >> 8).astype(np.int32)
    idx = np.clip(src_x[:, None] + np.arange(-3, 5)[None, :], 0,
                  src_w - 1).astype(np.int32)          # (out_w, 8)
    f = jnp.asarray(_RESIZE[fidx])                     # (out_w, 8)
    g = src[:, jnp.asarray(idx.reshape(-1))].reshape(
        src.shape[0], out_w, 8)
    acc = jnp.sum(g * f[None], axis=2)
    return jnp.clip((-acc + 64) >> 7, 0, (1 << bitdepth) - 1)
