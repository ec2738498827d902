"""NumPy reference CDEF (constrained directional enhancement filter).

Semantics per AV1 spec 7.15, cross-checked vs dav1d src/cdef_tmpl.c and the
application driver src/cdef_apply_tmpl.c. The frame-level application is
formulated as OUT = f(IN) over a pre-CDEF snapshot (equivalent to dav1d's
in-place pass with 2-line/2-column pre-filter backups).
"""
from __future__ import annotations

import numpy as np

from ...data.tables import TABLES

_DIRS_RAW = TABLES["cdef_directions"]  # [12][2], off = dy*12 + dx
CDEF_DIRECTIONS = []
for k in range(12):
    pair = []
    for p in range(2):
        off = int(_DIRS_RAW[k][p])
        dy = (off + 6) // 12
        dx = off - 12 * dy
        pair.append((dy, dx))
    CDEF_DIRECTIONS.append(pair)

HAVE_LEFT, HAVE_RIGHT, HAVE_TOP, HAVE_BOTTOM = 1, 2, 4, 8
MISSING = -32768  # INT16_MIN marker for unavailable pixels


def cdef_find_dir(img, bitdepth):
    """img: (8, 8) pixels. Returns (dir, var)."""
    bd_m8 = bitdepth - 8
    ps_hv = np.zeros((2, 8), np.int64)
    ps_diag = np.zeros((2, 15), np.int64)
    ps_alt = np.zeros((4, 11), np.int64)
    for y in range(8):
        for x in range(8):
            px = (int(img[y, x]) >> bd_m8) - 128
            ps_diag[0][y + x] += px
            ps_alt[0][y + (x >> 1)] += px
            ps_hv[0][y] += px
            ps_alt[1][3 + y - (x >> 1)] += px
            ps_diag[1][7 + y - x] += px
            ps_alt[2][3 - (y >> 1) + x] += px
            ps_hv[1][x] += px
            ps_alt[3][(y >> 1) + x] += px

    M = 0xFFFFFFFF  # uint32 wrapping, matching the reference's cost type
    cost = [0] * 8
    cost[2] = (int((ps_hv[0] ** 2).sum()) * 105) & M
    cost[6] = (int((ps_hv[1] ** 2).sum()) * 105) & M
    div = (840, 420, 280, 210, 168, 140, 120)
    for n in range(7):
        d = div[n]
        cost[0] = (cost[0] + (int(ps_diag[0][n]) ** 2 +
                              int(ps_diag[0][14 - n]) ** 2) * d) & M
        cost[4] = (cost[4] + (int(ps_diag[1][n]) ** 2 +
                              int(ps_diag[1][14 - n]) ** 2) * d) & M
    cost[0] = (cost[0] + int(ps_diag[0][7]) ** 2 * 105) & M
    cost[4] = (cost[4] + int(ps_diag[1][7]) ** 2 * 105) & M
    for n in range(4):
        c = 0
        for m in range(5):
            c += int(ps_alt[n][3 + m]) ** 2
        c *= 105
        for m in range(3):
            d = div[2 * m + 1]
            c += (int(ps_alt[n][m]) ** 2 + int(ps_alt[n][10 - m]) ** 2) * d
        cost[n * 2 + 1] = c & M

    best_dir = 0
    best_cost = cost[0]
    for n in range(1, 8):
        if cost[n] > best_cost:
            best_cost = cost[n]
            best_dir = n
    var = ((best_cost - cost[best_dir ^ 4]) & 0xFFFFFFFF) >> 10
    return best_dir, var


def _constrain(diff, threshold, shift):
    if diff == 0 or threshold == 0:
        return 0
    adiff = abs(diff)
    v = min(adiff, max(0, threshold - (adiff >> shift)))
    return v if diff > 0 else -v


def cdef_filter_block(dst, src, x0, y0, w, h, pri_strength, sec_strength,
                      dir_, damping, edges, bitdepth):
    """dst/src: full planes (src = pre-CDEF snapshot); filters the w x h
    block at (x0, y0) reading src, writing dst."""
    bd_m8 = bitdepth - 8

    def t(yy, xx):
        # padded read: MISSING where outside per edge flags
        if yy < 0 and not (edges & HAVE_TOP):
            return MISSING
        if yy >= h and not (edges & HAVE_BOTTOM):
            return MISSING
        if xx < 0 and not (edges & HAVE_LEFT):
            return MISSING
        if xx >= w and not (edges & HAVE_RIGHT):
            return MISSING
        return int(src[y0 + yy, x0 + xx])

    if pri_strength:
        pri_tap = 4 - ((pri_strength >> bd_m8) & 1)
        pri_shift = max(0, damping - (pri_strength.bit_length() - 1))
    sec_shift = damping - (sec_strength.bit_length() - 1) if sec_strength \
        else 0

    for y in range(h):
        for x in range(w):
            px = int(src[y0 + y, x0 + x])
            sum_ = 0
            mn = mx = px
            use_minmax = pri_strength and sec_strength
            if pri_strength:
                tap_k = pri_tap
                for k in range(2):
                    dy, dx = CDEF_DIRECTIONS[dir_ + 2][k]
                    p0 = t(y + dy, x + dx)
                    p1 = t(y - dy, x - dx)
                    for p in (p0, p1):
                        if p != MISSING:
                            sum_ += tap_k * _constrain(p - px, pri_strength,
                                                       pri_shift)
                            if use_minmax:
                                mn = min(mn, p)
                                mx = max(mx, p)
                    tap_k = (tap_k & 3) | 2
                    if sec_strength:
                        for doff in (4, 0):
                            dy2, dx2 = CDEF_DIRECTIONS[dir_ + doff][k]
                            for sgn in (1, -1):
                                s = t(y + sgn * dy2, x + sgn * dx2)
                                if s != MISSING:
                                    sum_ += (2 - k) * _constrain(
                                        s - px, sec_strength, sec_shift)
                                    mn = min(mn, s)
                                    mx = max(mx, s)
            else:
                for k in range(2):
                    for doff in (4, 0):
                        dy2, dx2 = CDEF_DIRECTIONS[dir_ + doff][k]
                        for sgn in (1, -1):
                            s = t(y + sgn * dy2, x + sgn * dx2)
                            if s != MISSING:
                                sum_ += (2 - k) * _constrain(
                                    s - px, sec_strength, sec_shift)
            v = px + ((sum_ - (1 if sum_ < 0 else 0) + 8) >> 4)
            if use_minmax:
                v = max(mn, min(mx, v))
            dst[y0 + y, x0 + x] = v


def adjust_strength(strength, var):
    if not var:
        return 0
    i = min((var >> 6).bit_length() - 1, 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


UV_DIRS = ((0, 1, 2, 3, 4, 5, 6, 7), (7, 0, 2, 4, 5, 6, 6, 6))


def apply_cdef_frame(planes, seq, fhdr, cdef_idx_map, noskip, bw4, bh4,
                     ss_hor, ss_ver):
    """planes: list of pixel arrays (modified in place).
    cdef_idx_map: (n_sb64_y, n_sb64_x) int map of per-64x64 cdef indices
    (-1 = none); noskip: (bh4, bw4) bool (any 4x4 not skipped);
    bw4/bh4: padded frame dims in 4px units."""
    bitdepth = seq.bitdepth
    bd_m8 = bitdepth - 8
    damping = fhdr.cdef_damping + bd_m8
    monochrome = seq.layout == 0
    layout = seq.layout
    uv_dir_tab = UV_DIRS[1 if (ss_hor and not ss_ver) else 0]

    srcs = [p.copy() for p in planes]

    for by in range(0, bh4, 2):
        for bx in range(0, bw4, 2):
            sb64x, sb64y = bx >> 4, by >> 4
            cdef_idx = int(cdef_idx_map[sb64y, sb64x])
            if cdef_idx == -1:
                continue
            y_lvl = fhdr.cdef_y_strength[cdef_idx]
            uv_lvl = fhdr.cdef_uv_strength[cdef_idx]
            if not y_lvl and not uv_lvl:
                continue
            if not noskip[by:by + 2, bx:bx + 2].any():
                continue

            edges = ((HAVE_LEFT if bx > 0 else 0) |
                     (HAVE_RIGHT if bx + 2 < bw4 else 0) |
                     (HAVE_TOP if by > 0 else 0) |
                     (HAVE_BOTTOM if by + 2 < bh4 else 0))

            y_pri = (y_lvl >> 2) << bd_m8
            y_sec = y_lvl & 3
            y_sec += y_sec == 3
            y_sec <<= bd_m8
            uv_pri = (uv_lvl >> 2) << bd_m8
            uv_sec = uv_lvl & 3
            uv_sec += uv_sec == 3
            uv_sec <<= bd_m8

            dir_ = 0
            var = 0
            if y_pri or uv_pri:
                dir_, var = cdef_find_dir(
                    srcs[0][by * 4:by * 4 + 8, bx * 4:bx * 4 + 8], bitdepth)

            if y_pri:
                adj = adjust_strength(y_pri, var)
                if adj or y_sec:
                    cdef_filter_block(planes[0], srcs[0], bx * 4, by * 4,
                                      8, 8, adj, y_sec, dir_, damping,
                                      edges, bitdepth)
            elif y_sec:
                cdef_filter_block(planes[0], srcs[0], bx * 4, by * 4,
                                  8, 8, 0, y_sec, 0, damping, edges,
                                  bitdepth)

            if uv_lvl and not monochrome:
                uvdir = uv_dir_tab[dir_] if uv_pri else 0
                cw = 8 >> ss_hor
                ch = 8 >> ss_ver
                for pl in (1, 2):
                    cdef_filter_block(
                        planes[pl], srcs[pl], (bx * 4) >> ss_hor,
                        (by * 4) >> ss_ver, cw, ch, uv_pri, uv_sec,
                        uvdir, damping - 1, edges, bitdepth)
