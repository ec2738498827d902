"""NumPy reference deblocking filter (bit-exact).

Instead of dav1d's per-superblock bitmasks (src/lf_mask.c), we build dense
per-4x4-edge arrays (filter-width index + level) — the same formulation the
TPU kernels consume — and apply the AV1 edge filters
(dav1d src/loopfilter_tmpl.c:37-161 semantics) vertical-edges-first then
horizontal, which matches the spec's filtering order.
"""
from __future__ import annotations

import numpy as np


def calc_eih(sharpness: int):
    """E/I lookup per level (dav1d src/lf_mask.c:412 dav1d_calc_eih)."""
    i_lut = np.zeros(64, np.int32)
    e_lut = np.zeros(64, np.int32)
    for level in range(64):
        limit = level
        if sharpness > 0:
            limit >>= (sharpness + 3) >> 2
            limit = min(limit, 9 - sharpness)
        limit = max(limit, 1)
        i_lut[level] = limit
        e_lut[level] = 2 * (level + 2) + limit
    return e_lut, i_lut


def calc_lf_value(base_lvl, lf_delta, seg_delta, mr_delta):
    """Returns level for (ref=INTRA, mode=0) (src/lf_mask.c:431)."""
    base = max(0, min(63, max(0, min(63, base_lvl + lf_delta)) + seg_delta))
    if mr_delta is None:
        return base
    sh = 1 if base >= 32 else 0
    return max(0, min(63, base + mr_delta.ref_delta[0] * (1 << sh)))


def _filter_edge(plane, xs, ys, stepx, stepy, E, I, H, wd, bitdepth):
    """Filter one 4-sample edge segment. (xs, ys): position of the first
    sample ON the edge (q0 side); (stepx, stepy): direction ACROSS the edge
    (unit vector from p side to q side); the 4 samples run perpendicular."""
    bd_m8 = bitdepth - 8
    F = 1 << bd_m8
    E <<= bd_m8
    I <<= bd_m8
    H <<= bd_m8
    bd_max = (1 << bitdepth) - 1
    # along-edge direction
    ax, ay = (0, 1) if stepx else (1, 0)

    for i in range(4):
        bx = xs + ax * i
        by = ys + ay * i

        def g(k):  # sample at offset k across the edge (q0 = 0)
            return int(plane[by + stepy * k, bx + stepx * k])

        def s(k, v):
            plane[by + stepy * k, bx + stepx * k] = v

        p1, p0, q0, q1 = g(-2), g(-1), g(0), g(1)
        fm = (abs(p1 - p0) <= I and abs(q1 - q0) <= I and
              abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= E)
        if wd > 4:
            p2, q2 = g(-3), g(2)
            fm = fm and abs(p2 - p1) <= I and abs(q2 - q1) <= I
            if wd > 6:
                p3, q3 = g(-4), g(3)
                fm = fm and abs(p3 - p2) <= I and abs(q3 - q2) <= I
        if not fm:
            continue

        if wd >= 16:
            p6, p5, p4 = g(-7), g(-6), g(-5)
            q4, q5, q6 = g(4), g(5), g(6)
            flat8out = (abs(p6 - p0) <= F and abs(p5 - p0) <= F and
                        abs(p4 - p0) <= F and abs(q4 - q0) <= F and
                        abs(q5 - q0) <= F and abs(q6 - q0) <= F)
        if wd >= 6:
            flat8in = (abs(p2 - p0) <= F and abs(p1 - p0) <= F and
                       abs(q1 - q0) <= F and abs(q2 - q0) <= F)
        if wd >= 8:
            flat8in = flat8in and abs(p3 - p0) <= F and abs(q3 - q0) <= F

        if wd >= 16 and flat8out and flat8in:
            s(-6, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0
                   + 8) >> 4)
            s(-5, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0
                   + q1 + 8) >> 4)
            s(-4, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0
                   + q1 + q2 + 8) >> 4)
            s(-3, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0
                   + q1 + q2 + q3 + 8) >> 4)
            s(-2, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0
                   + q1 + q2 + q3 + q4 + 8) >> 4)
            s(-1, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1
                   + q2 + q3 + q4 + q5 + 8) >> 4)
            s(0, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2
                  + q3 + q4 + q5 + q6 + 8) >> 4)
            s(1, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3
                  + q4 + q5 + q6 * 2 + 8) >> 4)
            s(2, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4
                  + q5 + q6 * 3 + 8) >> 4)
            s(3, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5
                  + q6 * 4 + 8) >> 4)
            s(4, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2
                  + q6 * 5 + 8) >> 4)
            s(5, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7
                  + 8) >> 4)
        elif wd >= 8 and flat8in:
            s(-3, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3)
            s(-2, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3)
            s(-1, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3)
            s(0, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3)
            s(1, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3)
            s(2, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3)
        elif wd == 6 and flat8in:
            s(-2, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3)
            s(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
            s(0, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
            s(1, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3)
        else:
            hev = abs(p1 - p0) > H or abs(q1 - q0) > H
            lo = -128 * (1 << bd_m8)
            hi = 128 * (1 << bd_m8) - 1

            def cd(v):
                return max(lo, min(hi, v))
            if hev:
                f = cd(p1 - q1)
                f = cd(3 * (q0 - p0) + f)
                f1 = min(f + 4, hi) >> 3
                f2 = min(f + 3, hi) >> 3
                s(-1, max(0, min(bd_max, p0 + f2)))
                s(0, max(0, min(bd_max, q0 - f1)))
            else:
                f = cd(3 * (q0 - p0))
                f1 = min(f + 4, hi) >> 3
                f2 = min(f + 3, hi) >> 3
                s(-1, max(0, min(bd_max, p0 + f2)))
                s(0, max(0, min(bd_max, q0 - f1)))
                f = (f1 + 1) >> 1
                s(-2, max(0, min(bd_max, p1 + f)))
                s(1, max(0, min(bd_max, q1 - f)))


def apply_deblock(plane, edge_idx_v, edge_idx_h, lvl, lvl_idx_v, lvl_idx_h,
                  e_lut, i_lut, wd_map, bitdepth, sb_step4):
    """Vectorized host deblock: one global vertical pass + one global
    horizontal pass, sharing the verified kernel logic with the device
    implementation (ops/loopfilter_tpu) via xp=numpy. Equivalent to the
    per-edge scan below (apply_deblock_scalar) by the AV1 width rules —
    see deblock_plane_tpu's proof note."""
    from ...ops.loopfilter_tpu import _apply_pass, _apply_pass_h

    h4, w4 = edge_idx_v.shape
    luma = len(wd_map) == 3
    e_lut = np.asarray(e_lut, np.int32)
    i_lut = np.asarray(i_lut, np.int32)
    lv = lvl[:, :, lvl_idx_v].astype(np.int32)
    lvp = np.zeros_like(lv)
    lvp[:, 1:] = lv[:, :-1]
    lh = lvl[:, :, lvl_idx_h].astype(np.int32)
    lhp = np.zeros_like(lh)
    lhp[1:] = lh[:-1]

    work = plane.astype(np.int32)
    ev = edge_idx_v.astype(np.int32).copy()
    ev[:, 0] = -1
    work[:h4 * 4] = _apply_pass(work[:h4 * 4], ev, lv, lvp, e_lut, i_lut,
                                luma, bitdepth, False, xp=np)
    eh = edge_idx_h.T.astype(np.int32).copy()
    eh[:, 0] = -1
    nvis = w4 * 4
    workT = np.ascontiguousarray(work.T)
    workT[:nvis] = _apply_pass_h(workT[:nvis], eh, lh.T.copy(),
                                 lhp.T.copy(), e_lut, i_lut, luma,
                                 bitdepth, 0, xp=np)
    plane[...] = workT.T.astype(plane.dtype)
    return plane


def apply_deblock_scalar(plane, edge_idx_v, edge_idx_h, lvl, lvl_idx_v,
                         lvl_idx_h, e_lut, i_lut, wd_map, bitdepth,
                         sb_step4):
    """plane: pixel array; edge_idx_{v,h}: (h4, w4) int arrays, -1 = no edge
    else size idx; lvl: (h4, w4, 2) levels; lvl_idx: which lvl component to
    use; wd_map: size idx -> filter width ([4,8,16] luma, [4,6] uv);
    sb_step4: superblock size in (plane) 4px units.

    Order matches dav1d's canonical single-thread sequence: per superblock
    row, all vertical edges (x-major) then all horizontal edges (y-major)."""
    h4, w4 = edge_idx_v.shape
    for sby4 in range(0, h4, sb_step4):
        endy4 = min(h4, sby4 + sb_step4)
        # vertical edges: x-major, left to right; top to bottom within col
        for x in range(1, w4):
            col = edge_idx_v[:, x]
            for y in range(sby4, endy4):
                idx = col[y]
                if idx < 0:
                    continue
                lv = int(lvl[y, x, lvl_idx_v])
                if not lv:
                    lv = int(lvl[y, x - 1, lvl_idx_v])
                    if not lv:
                        continue
                _filter_edge(plane, x * 4, y * 4, 1, 0,
                             int(e_lut[lv]), int(i_lut[lv]), lv >> 4,
                             wd_map[idx], bitdepth)
        # horizontal edges: y-major, top to bottom; left to right within row
        for y in range(max(sby4, 1), endy4):
            row = edge_idx_h[y]
            for x in range(w4):
                idx = row[x]
                if idx < 0:
                    continue
                lv = int(lvl[y, x, lvl_idx_h])
                if not lv:
                    lv = int(lvl[y - 1, x, lvl_idx_h])
                    if not lv:
                        continue
                _filter_edge(plane, x * 4, y * 4, 0, 1,
                             int(e_lut[lv]), int(i_lut[lv]), lv >> 4,
                             wd_map[idx], bitdepth)
