"""NumPy reference motion compensation DSP (inter prediction kernels).

Semantics per AV1 spec 7.11.3, cross-checked vs dav1d src/mc_tmpl.c
(put/prep 8tap:112/224, scaled:172/287, bilin:396+, avg:589, w_avg:604,
mask:620, blend:643/655/668, w_mask:683, warp8x8:754/793, emu_edge:827,
resize:880). These are the golden models the TPU kernels are tested against;
they in turn are tested against the reference C build (oracle shim).

Conventions: pixel arrays are int32 2D (h, w) with enough guard context
passed explicitly; `prep` outputs int16-domain intermediates ("tmp") as
int32 arrays.
"""
from __future__ import annotations

import numpy as np

from ...data.tables import TABLES

SUBPEL_FILTERS = np.asarray(TABLES["mc_subpel_filters"], np.int32)  # (6,15,8)
WARP_FILTER = np.asarray(TABLES["mc_warp_filter"], np.int32)        # (193,8)
RESIZE_FILTER = np.asarray(TABLES["resize_filter"], np.int32)       # (64,8)
OBMC_MASKS = np.asarray(TABLES["obmc_masks"], np.int32)             # (64,)

# Dav1dFilter2d order (levels.h:185-194): value -> (type_h, type_v) where
# 0=regular, 1=smooth, 2=sharp; 9 = bilinear
FILTER_2D = [
    (0, 0),  # 8TAP_REGULAR
    (0, 1),  # 8TAP_REGULAR_SMOOTH
    (0, 2),  # 8TAP_REGULAR_SHARP
    (2, 0),  # 8TAP_SHARP_REGULAR
    (2, 1),  # 8TAP_SHARP_SMOOTH
    (2, 2),  # 8TAP_SHARP
    (1, 0),  # 8TAP_SMOOTH_REGULAR
    (1, 1),  # 8TAP_SMOOTH
    (1, 2),  # 8TAP_SMOOTH_SHARP
]
FILTER_2D_BILINEAR = 9


def _ibits(bitdepth):
    # intermediate_bits: 4 (8bpc), 4 (10bpc), 2 (12bpc)
    return 4 if bitdepth == 8 else 14 - bitdepth


def _prep_bias(bitdepth):
    return 0 if bitdepth == 8 else 8192


def _get_filter(ftype, subpel, small):
    """subpel in [1, 15]; small = dimension <= 4 (uses 4-tap rows)."""
    row = (3 + (ftype & 1)) if small else ftype
    return SUBPEL_FILTERS[row, subpel - 1]


def _conv8_h(src, fh, w):
    """src: (..., >= w+7) rows starting at tap -3; returns raw 8-tap sums
    over x in [0, w)."""
    out = np.zeros(src.shape[:-1] + (w,), np.int64)
    for k in range(8):
        out += fh[k] * src[..., k:k + w]
    return out


def put_8tap(src, w, h, mx, my, filter2d, bitdepth):
    """src: (h+7, w+7) int window with origin at (3, 3) (i.e. src[3+y, 3+x]
    is the nominal source pixel). Returns (h, w) pixels."""
    ib = _ibits(bitdepth)
    irnd = 32 + ((1 << (6 - ib)) >> 1)
    th, tv = FILTER_2D[filter2d]
    fh = _get_filter(th, mx, w <= 4) if mx else None
    fv = _get_filter(tv, my, h <= 4) if my else None
    bd_max = (1 << bitdepth) - 1
    s = src.astype(np.int64)

    if fh is not None and fv is not None:
        mid = _conv8_h(s[0:h + 7], fh, w)
        mid = (mid + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
        out = np.zeros((h, w), np.int64)
        for k in range(8):
            out += fv[k] * mid[k:k + h]
        out = (out + ((1 << (6 + ib)) >> 1)) >> (6 + ib)
        return np.clip(out, 0, bd_max).astype(np.int32)
    if fh is not None:
        mid = _conv8_h(s[3:3 + h], fh, w)
        return np.clip((mid + irnd) >> 6, 0, bd_max).astype(np.int32)
    if fv is not None:
        out = np.zeros((h, w), np.int64)
        for k in range(8):
            out += fv[k] * s[k:k + h, 3:3 + w]
        return np.clip((out + 32) >> 6, 0, bd_max).astype(np.int32)
    return s[3:3 + h, 3:3 + w].astype(np.int32)


def prep_8tap(src, w, h, mx, my, filter2d, bitdepth):
    """Same window convention as put_8tap; returns (h, w) int32 "tmp"."""
    ib = _ibits(bitdepth)
    bias = _prep_bias(bitdepth)
    th, tv = FILTER_2D[filter2d]
    fh = _get_filter(th, mx, w <= 4) if mx else None
    fv = _get_filter(tv, my, h <= 4) if my else None
    s = src.astype(np.int64)

    if fh is not None and fv is not None:
        mid = _conv8_h(s[0:h + 7], fh, w)
        mid = (mid + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
        out = np.zeros((h, w), np.int64)
        for k in range(8):
            out += fv[k] * mid[k:k + h]
        return (((out + 32) >> 6) - bias).astype(np.int32)
    if fh is not None:
        mid = _conv8_h(s[3:3 + h], fh, w)
        return (((mid + ((1 << (6 - ib)) >> 1)) >> (6 - ib)) - bias) \
            .astype(np.int32)
    if fv is not None:
        out = np.zeros((h, w), np.int64)
        for k in range(8):
            out += fv[k] * s[k:k + h, 3:3 + w]
        return (((out + ((1 << (6 - ib)) >> 1)) >> (6 - ib)) - bias) \
            .astype(np.int32)
    return ((s[3:3 + h, 3:3 + w] << ib) - bias).astype(np.int32)


def _scaled_h_pass(s, w, tmp_h, mx, dx, th, small_w, ib):
    """Horizontal pass of the scaled path: per-column subpel position."""
    mid = np.zeros((tmp_h, w), np.int64)
    for y in range(tmp_h):
        imx = mx
        ioff = 0
        for x in range(w):
            sub = imx >> 6
            if sub:
                fh = _get_filter(th, sub, small_w)
                v = 0
                for k in range(8):
                    v += int(fh[k]) * int(s[y, ioff + k])
                mid[y, x] = (v + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
            else:
                mid[y, x] = int(s[y, ioff + 3]) << ib
            imx += dx
            ioff += imx >> 10
            imx &= 0x3FF
    return mid


def put_8tap_scaled(src, w, h, mx, my, dx, dy, filter2d, bitdepth):
    """src: (tmp_h, W) window with origin at (3, 3) where
    tmp_h = ((h-1)*dy + my >> 10) + 8 and W covers all horizontal taps.
    Returns (h, w) pixels."""
    ib = _ibits(bitdepth)
    irnd = (1 << ib) >> 1
    th, tv = FILTER_2D[filter2d]
    bd_max = (1 << bitdepth) - 1
    tmp_h = (((h - 1) * dy + my) >> 10) + 8
    mid = _scaled_h_pass(src.astype(np.int64), w, tmp_h, mx, dx, th,
                         w <= 4, ib)
    out = np.zeros((h, w), np.int32)
    row = 0
    for y in range(h):
        sub = my >> 6
        if sub:
            fv = _get_filter(tv, sub, h <= 4)
            v = np.zeros(w, np.int64)
            for k in range(8):
                v += fv[k] * mid[row + k]
            out[y] = np.clip((v + ((1 << (6 + ib)) >> 1)) >> (6 + ib),
                             0, bd_max)
        else:
            out[y] = np.clip((mid[row + 3] + irnd) >> ib, 0, bd_max)
        my += dy
        row += my >> 10
        my &= 0x3FF
    return out


def prep_8tap_scaled(src, w, h, mx, my, dx, dy, filter2d, bitdepth):
    ib = _ibits(bitdepth)
    bias = _prep_bias(bitdepth)
    th, tv = FILTER_2D[filter2d]
    tmp_h = (((h - 1) * dy + my) >> 10) + 8
    mid = _scaled_h_pass(src.astype(np.int64), w, tmp_h, mx, dx, th,
                         w <= 4, ib)
    out = np.zeros((h, w), np.int32)
    row = 0
    for y in range(h):
        sub = my >> 6
        if sub:
            fv = _get_filter(tv, sub, h <= 4)
            v = np.zeros(w, np.int64)
            for k in range(8):
                v += fv[k] * mid[row + k]
            out[y] = ((v + 32) >> 6) - bias
        else:
            out[y] = mid[row + 3] - bias
        my += dy
        row += my >> 10
        my &= 0x3FF
    return out


def put_bilin(src, w, h, mx, my, bitdepth):
    """src: (h+1, w+1) window with origin (0, 0)."""
    ib = _ibits(bitdepth)
    irnd = (1 << ib) >> 1
    bd_max = (1 << bitdepth) - 1
    s = src.astype(np.int64)

    def bil(a, b, mxy, sh):
        return (16 * a + mxy * (b - a) + ((1 << sh) >> 1)) >> sh

    if mx:
        if my:
            mid = bil(s[0:h + 2, 0:w], s[0:h + 2, 1:w + 1], mx, 4 - ib)
            out = bil(mid[0:h], mid[1:h + 1], my, 4 + ib)
            return np.clip(out, 0, bd_max).astype(np.int32)
        px = bil(s[0:h, 0:w], s[0:h, 1:w + 1], mx, 4 - ib)
        return np.clip((px + irnd) >> ib, 0, bd_max).astype(np.int32)
    if my:
        out = bil(s[0:h, 0:w], s[1:h + 1, 0:w], my, 4)
        return np.clip(out, 0, bd_max).astype(np.int32)
    return s[0:h, 0:w].astype(np.int32)


def prep_bilin(src, w, h, mx, my, bitdepth):
    ib = _ibits(bitdepth)
    bias = _prep_bias(bitdepth)
    s = src.astype(np.int64)

    def bil(a, b, mxy, sh):
        return (16 * a + mxy * (b - a) + ((1 << sh) >> 1)) >> sh

    if mx:
        if my:
            mid = bil(s[0:h + 2, 0:w], s[0:h + 2, 1:w + 1], mx, 4 - ib)
            return (bil(mid[0:h], mid[1:h + 1], my, 4) - bias) \
                .astype(np.int32)
        return (bil(s[0:h, 0:w], s[0:h, 1:w + 1], mx, 4 - ib) - bias) \
            .astype(np.int32)
    if my:
        return (bil(s[0:h, 0:w], s[1:h + 1, 0:w], my, 4 - ib) - bias) \
            .astype(np.int32)
    return ((s[0:h, 0:w] << ib) - bias).astype(np.int32)


def avg(tmp1, tmp2, bitdepth):
    ib = _ibits(bitdepth)
    rnd = (1 << ib) + _prep_bias(bitdepth) * 2
    out = (tmp1.astype(np.int64) + tmp2 + rnd) >> (ib + 1)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def w_avg(tmp1, tmp2, weight, bitdepth):
    ib = _ibits(bitdepth)
    rnd = (8 << ib) + _prep_bias(bitdepth) * 16
    out = (tmp1.astype(np.int64) * weight + tmp2 * (16 - weight) + rnd) \
        >> (ib + 4)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def mask(tmp1, tmp2, m, bitdepth):
    ib = _ibits(bitdepth)
    rnd = (32 << ib) + _prep_bias(bitdepth) * 64
    m = m.astype(np.int64)
    out = (tmp1.astype(np.int64) * m + tmp2 * (64 - m) + rnd) >> (ib + 6)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def blend(dst, tmp, m):
    m = np.asarray(m, np.int64)
    return ((dst.astype(np.int64) * (64 - m) + tmp * m + 32) >> 6) \
        .astype(np.int32)


def blend_v(dst, tmp, w, h):
    m = OBMC_MASKS[w:w + ((w * 3) >> 2)].astype(np.int64)
    out = dst.astype(np.int32).copy()
    ww = (w * 3) >> 2
    out[:, :ww] = ((dst[:, :ww].astype(np.int64) * (64 - m) +
                    tmp[:, :ww] * m + 32) >> 6)
    return out


def blend_h(dst, tmp, w, h):
    hh = (h * 3) >> 2
    m = OBMC_MASKS[h:h + hh].astype(np.int64)[:, None]
    out = dst.astype(np.int32).copy()
    out[:hh] = ((dst[:hh].astype(np.int64) * (64 - m) +
                 tmp[:hh] * m + 32) >> 6)
    return out


def w_mask(tmp1, tmp2, w, h, sign, ss_hor, ss_ver, bitdepth):
    """Returns (pixels (h, w), mask (h >> ss_ver, w >> ss_hor))."""
    ib = _ibits(bitdepth)
    sh = ib + 6
    rnd = (32 << ib) + _prep_bias(bitdepth) * 64
    mask_sh = bitdepth + ib - 4
    mask_rnd = 1 << (mask_sh - 5)
    t1 = tmp1.astype(np.int64)
    t2 = tmp2.astype(np.int64)
    m = np.minimum(38 + ((np.abs(t1 - t2) + mask_rnd) >> mask_sh), 64)
    dst = np.clip((t1 * m + t2 * (64 - m) + rnd) >> sh,
                  0, (1 << bitdepth) - 1).astype(np.int32)
    if ss_hor:
        mpair = m[:, 0::2] + m[:, 1::2]
        if ss_ver:
            mm = (mpair[0::2] + mpair[1::2] + 2 - sign) >> 2
        else:
            mm = (mpair + 1 - sign) >> 1
    else:
        mm = m
    return dst, mm.astype(np.int32)


def warp8x8(src, abcd, mx, my, bitdepth):
    """src: (15, 15) window with origin at (3, 3) (nominal top-left sample);
    abcd: 4 int16 deltas. Returns (8, 8) pixels."""
    ib = _ibits(bitdepth)
    bd_max = (1 << bitdepth) - 1
    s = src.astype(np.int64)
    mid = np.zeros((15, 8), np.int64)
    for y in range(15):
        tmx = mx
        for x in range(8):
            f = WARP_FILTER[64 + ((tmx + 512) >> 10)]
            v = 0
            for k in range(8):
                v += int(f[k]) * int(s[y, x + k])
            mid[y, x] = (v + ((1 << (7 - ib)) >> 1)) >> (7 - ib)
            tmx += abcd[0]
        mx += abcd[1]
    out = np.zeros((8, 8), np.int32)
    for y in range(8):
        tmy = my
        for x in range(8):
            f = WARP_FILTER[64 + ((tmy + 512) >> 10)]
            v = 0
            for k in range(8):
                v += int(f[k]) * int(mid[y + k, x])
            out[y, x] = min(max((v + ((1 << (7 + ib)) >> 1)) >> (7 + ib), 0),
                            bd_max)
            tmy += abcd[2]
        my += abcd[3]
    return out


def warp8x8t(src, abcd, mx, my, bitdepth):
    """Like warp8x8 but outputs the int16 "tmp" domain."""
    ib = _ibits(bitdepth)
    bias = _prep_bias(bitdepth)
    s = src.astype(np.int64)
    mid = np.zeros((15, 8), np.int64)
    for y in range(15):
        tmx = mx
        for x in range(8):
            f = WARP_FILTER[64 + ((tmx + 512) >> 10)]
            v = 0
            for k in range(8):
                v += int(f[k]) * int(s[y, x + k])
            mid[y, x] = (v + ((1 << (7 - ib)) >> 1)) >> (7 - ib)
            tmx += abcd[0]
        mx += abcd[1]
    out = np.zeros((8, 8), np.int32)
    for y in range(8):
        tmy = my
        for x in range(8):
            f = WARP_FILTER[64 + ((tmy + 512) >> 10)]
            v = 0
            for k in range(8):
                v += int(f[k]) * int(mid[y + k, x])
            out[y, x] = ((v + 64) >> 7) - bias
            tmy += abcd[2]
        my += abcd[3]
    return out


def emu_edge(bw, bh, iw, ih, x, y, ref):
    """ref: (ih, iw). Returns (bh, bw) with clamped-edge extension, matching
    the reference's block copy + edge extension."""
    ys = np.clip(np.arange(y, y + bh), 0, ih - 1)
    xs = np.clip(np.arange(x, x + bw), 0, iw - 1)
    return ref[np.ix_(ys, xs)].astype(np.int32)


def resize_row(src, dst_w, src_w, dx, mx0):
    """src: (h, >=src_w); horizontal resample of each row. Returns
    (h, dst_w). Caller clips to pixel range."""
    h = src.shape[0]
    out = np.zeros((h, dst_w), np.int64)
    mx = mx0
    src_x = -1
    for x in range(dst_w):
        f = RESIZE_FILTER[mx >> 8]
        idx = np.clip(np.arange(src_x - 3, src_x + 5), 0, src_w - 1)
        acc = np.zeros(h, np.int64)
        for k in range(8):
            acc += int(f[k]) * src[:, idx[k]].astype(np.int64)
        out[:, x] = (-acc + 64) >> 7
        mx += dx
        src_x += mx >> 14
        mx &= 0x3FFF
    return out


def resize(src, dst_w, h, src_w, dx, mx0, bitdepth):
    out = resize_row(src, dst_w, src_w, dx, mx0)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)
