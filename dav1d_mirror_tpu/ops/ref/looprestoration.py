"""NumPy reference loop restoration (wiener + self-guided), bit-exact.

Semantics per AV1 spec 7.17, cross-checked vs dav1d
src/looprestoration_tmpl.c (padding:42, wiener:134, boxsum3/5:214/291,
selfguided:350) and the stripe/unit driver src/lr_apply_tmpl.c.
"""
from __future__ import annotations

import numpy as np

from ...data.tables import TABLES

SGR_PARAMS = TABLES["sgr_params"]        # [16][2]
SGR_X_BY_X = TABLES["sgr_x_by_x"]        # [256]

LR_HAVE_LEFT, LR_HAVE_RIGHT, LR_HAVE_TOP, LR_HAVE_BOTTOM = 1, 2, 4, 8

RESTORATION_NONE = 0
RESTORATION_WIENER = 2
RESTORATION_SGRPROJ = 3


def padding(p, left, above2, below2, w, h, edges):
    """Builds the (h+6, w+6) padded stripe input.

    p: (h, w+3?) view of the unit's rows (int); indexable p[y, x] with x in
    [-3, w+3) supported via the caller passing a wider window: here we take
    explicit arrays instead:
      p: (h, w) unit pixels (pre-LR for this unit)
      left: (h, 4) pre-LR columns left of the unit (cols x-4..x-1), or None
      p_right: included via p_ext below.
    To keep this general we accept p_ext: (h, w+6) = unit with 3 guard cols
    on each side taken from the pre-LR plane, and above2/below2: (2, w+6)
    rows from the pre-deblock-backup (lpf) domain, or None when the edge is
    absent."""
    raise NotImplementedError  # see pad_stripe below


def pad_stripe(p_ext, left, above2, below2, w, h, edges):
    """p_ext: (h, w+6) int32 — the unit rows with 3 guard columns each side
    (guard cols only meaningful when the corresponding edge exists);
    left: (h, 3) pre-LR left columns (used when LR_HAVE_LEFT);
    above2/below2: (2, w+6) boundary rows (same column layout as p_ext).
    Returns (h+6, w+6) padded buffer."""
    out = np.zeros((h + 6, w + 6), np.int32)
    have_left = bool(edges & LR_HAVE_LEFT)
    have_right = bool(edges & LR_HAVE_RIGHT)

    # center rows: unit + 3 guard columns each side
    out[3:3 + h, :] = p_ext
    if have_left:
        out[3:3 + h, 0:3] = left
    # top
    if edges & LR_HAVE_TOP:
        out[0] = above2[0]
        out[1] = above2[0]
        out[2] = above2[1]
    else:
        out[0] = out[1] = out[2] = out[3]
    # bottom
    if edges & LR_HAVE_BOTTOM:
        out[3 + h] = below2[0]
        out[4 + h] = below2[1]
        out[5 + h] = below2[1]
    else:
        out[3 + h] = out[4 + h] = out[5 + h] = out[2 + h]
    # columns
    if not have_left:
        out[:, 0] = out[:, 3]
        out[:, 1] = out[:, 3]
        out[:, 2] = out[:, 3]
    if not have_right:
        out[:, w + 3] = out[:, w + 2]
        out[:, w + 4] = out[:, w + 2]
        out[:, w + 5] = out[:, w + 2]
    return out


def wiener_stripe(p_out, padded, x0, y0, w, h, filter_h, filter_v, bitdepth):
    """padded: (h+6, w+6); writes the filtered (h, w) block into p_out at
    (y0, x0)."""
    fh = np.zeros(7, np.int32)
    fh[0] = fh[6] = filter_h[0]
    fh[1] = fh[5] = filter_h[1]
    fh[2] = fh[4] = filter_h[2]
    fh[3] = 128 - (fh[0] + fh[1] + fh[2]) * 2
    fv = np.zeros(7, np.int32)
    fv[0] = fv[6] = filter_v[0]
    fv[1] = fv[5] = filter_v[1]
    fv[2] = fv[4] = filter_v[2]
    fv[3] = 128 - (fv[0] + fv[1] + fv[2]) * 2

    round_bits_h = 3 + (bitdepth == 12) * 2
    rnd_h = 1 << (round_bits_h - 1)
    clip_limit = 1 << (bitdepth + 1 + 7 - round_bits_h)
    # horizontal pass over h+6 rows
    hor = np.zeros((h + 6, w), np.int32)
    base = 1 << (bitdepth + 6)
    for k in range(7):
        hor += padded[:, k:k + w] * fh[k]
    hor = np.clip((hor + base + rnd_h) >> round_bits_h, 0, clip_limit - 1)

    round_bits_v = 11 - (bitdepth == 12) * 2
    rnd_v = 1 << (round_bits_v - 1)
    round_offset = 1 << (bitdepth + round_bits_v - 1)
    out = np.zeros((h, w), np.int32)
    for k in range(7):
        out += hor[k:k + h] * fv[k]
    out = np.clip((out - round_offset + rnd_v) >> round_bits_v, 0,
                  (1 << bitdepth) - 1)
    p_out[y0:y0 + h, x0:x0 + w] = out


def _boxsum(padded, n):
    """padded: (H, W) int64. Returns (sum, sumsq) with [y, x] = sum over the
    n x n box centred at (y, x) (n odd: 3 or 5)."""
    r = n >> 1
    H, W = padded.shape
    a = padded.astype(np.int64)
    a2 = a * a
    cs = np.zeros((H + 1, W), np.int64)
    cs2 = np.zeros((H + 1, W), np.int64)
    np.cumsum(a, axis=0, out=cs[1:])
    np.cumsum(a2, axis=0, out=cs2[1:])
    vs = cs[2 * r + 1:] - cs[:-2 * r - 1]     # (H-2r, W) vertical sums
    vs2 = cs2[2 * r + 1:] - cs2[:-2 * r - 1]
    hs = np.zeros((H - 2 * r, W + 1), np.int64)
    hs2 = np.zeros((H - 2 * r, W + 1), np.int64)
    np.cumsum(vs, axis=1, out=hs[:, 1:])
    np.cumsum(vs2, axis=1, out=hs2[:, 1:])
    s = hs[:, 2 * r + 1:] - hs[:, :-2 * r - 1]
    s2 = hs2[:, 2 * r + 1:] - hs2[:, :-2 * r - 1]
    # s[y, x] corresponds to box centred at padded[y+r, x+r]
    return s, s2


def selfguided(padded, w, h, n, s, bitdepth):
    """padded: (h+6, w+6); returns (h, w) int32 filter output (pre-weight).
    Mirrors dav1d selfguided_filter: A/B computed on the (w+2)x(h+2) grid
    around the unit with box size n (9 or 25), subsampled vertically by 2
    for n==25."""
    sgr_one_by_x = 164 if n == 25 else 455
    bd_m8 = bitdepth - 8
    rad = 2 if n == 25 else 1

    # box sums centred on each position of the padded grid (valid region
    # covers [rad, H-rad) x [rad, W-rad)); we need centres at padded coords
    # [2, h+4) x [2, w+4)  (i.e. unit +/- 1)
    box_s, box_s2 = _boxsum(padded, 2 * rad + 1)
    # box_s[y, x] is centred at padded[y+rad, x+rad]

    # A/B arrays over centre coords [-1, h+1) x [-1, w+1) rel. to unit
    # (padded coords [2, h+4) x [2, w+4))
    step = 2 if n == 25 else 1
    H2, W2 = h + 2, w + 2
    A = np.zeros((H2, W2), np.int64)
    B = np.zeros((H2, W2), np.int64)
    for j in range(0, H2, step):
        py = 2 + j  # padded row of centre
        ss_row = box_s[py - rad]
        ss2_row = box_s2[py - rad]
        for i in range(W2):
            px = 2 + i
            sv = int(ss_row[px - rad])
            sv2 = int(ss2_row[px - rad])
            a = (sv2 + ((1 << (2 * bd_m8)) >> 1)) >> (2 * bd_m8)
            b = (sv + ((1 << bd_m8) >> 1)) >> bd_m8
            pval = max(a * n - b * b, 0)
            z = (pval * s + (1 << 19)) >> 20
            x = int(SGR_X_BY_X[min(z, 255)])
            A[j, i] = (x * sv * sgr_one_by_x + (1 << 11)) >> 12
            B[j, i] = x

    src = padded[3:3 + h, 3:3 + w].astype(np.int64)
    dst = np.zeros((h, w), np.int32)
    ST = W2  # just for clarity

    def six(P, j, i):
        # P indexed on centre grid; unit pixel (j, i) = centre (j+1, i+1)
        cj, ci = j + 1, i + 1
        return ((int(P[cj - 1, ci]) + int(P[cj + 1, ci])) * 6 +
                (int(P[cj - 1, ci - 1]) + int(P[cj + 1, ci - 1]) +
                 int(P[cj - 1, ci + 1]) + int(P[cj + 1, ci + 1])) * 5)

    def eight(P, j, i):
        cj, ci = j + 1, i + 1
        return ((int(P[cj, ci]) + int(P[cj, ci - 1]) + int(P[cj, ci + 1]) +
                 int(P[cj - 1, ci]) + int(P[cj + 1, ci])) * 4 +
                (int(P[cj - 1, ci - 1]) + int(P[cj + 1, ci - 1]) +
                 int(P[cj - 1, ci + 1]) + int(P[cj + 1, ci + 1])) * 3)

    if n == 25:
        j = 0
        while j < h - 1:
            for i in range(w):
                a = six(B, j, i)
                b = six(A, j, i)
                dst[j, i] = (b - a * int(src[j, i]) + (1 << 8)) >> 9
            j += 1
            for i in range(w):
                cj, ci = j + 1, i + 1
                a = int(B[cj, ci]) * 6 + (int(B[cj, ci - 1]) +
                                          int(B[cj, ci + 1])) * 5
                b = int(A[cj, ci]) * 6 + (int(A[cj, ci - 1]) +
                                          int(A[cj, ci + 1])) * 5
                dst[j, i] = (b - a * int(src[j, i]) + (1 << 7)) >> 8
            j += 1
        if j + 1 == h:
            for i in range(w):
                a = six(B, j, i)
                b = six(A, j, i)
                dst[j, i] = (b - a * int(src[j, i]) + (1 << 8)) >> 9
    else:
        for j in range(h):
            for i in range(w):
                a = eight(B, j, i)
                b = eight(A, j, i)
                dst[j, i] = (b - a * int(src[j, i]) + (1 << 8)) >> 9
    return dst


def sgr_stripe(p_out, padded, x0, y0, w, h, lr_type, sgr_weights, bitdepth):
    """Apply the selected SGR variant to the stripe."""
    sgr_idx = lr_type - RESTORATION_SGRPROJ
    s0 = int(SGR_PARAMS[sgr_idx][0])
    s1 = int(SGR_PARAMS[sgr_idx][1])
    w0 = sgr_weights[0]
    w1 = 128 - (sgr_weights[0] + sgr_weights[1])
    cur = p_out[y0:y0 + h, x0:x0 + w].astype(np.int64)
    v = np.zeros((h, w), np.int64)
    if s0:
        d0 = selfguided(padded, w, h, 25, s0, bitdepth)
        if s1:
            d1 = selfguided(padded, w, h, 9, s1, bitdepth)
            v = w0 * d0.astype(np.int64) + w1 * d1.astype(np.int64)
        else:
            v = w0 * d0.astype(np.int64)
    else:
        d1 = selfguided(padded, w, h, 9, s1, bitdepth)
        # dsp->lr.sgr[1] (3x3 only) weights with w1 slot
        v = w1 * d1.astype(np.int64)
    out = np.clip(cur + ((v + (1 << 10)) >> 11), 0, (1 << bitdepth) - 1)
    p_out[y0:y0 + h, x0:x0 + w] = out.astype(p_out.dtype)
