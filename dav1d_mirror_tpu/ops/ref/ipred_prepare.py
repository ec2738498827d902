"""Intra edge assembly (port of dav1d src/ipred_prepare_tmpl.c semantics).

Builds the 257-entry topleft edge buffer (center=128) from the reconstructed
plane with AV1's availability/extension rules, and converts the coded mode to
the implementation mode (DC/PAETH fallbacks, directional -> Z1/Z2/Z3).
"""
from __future__ import annotations

import numpy as np

from . import ipred as ip

# EdgeFlags (I444 bits are what prepare consumes)
EDGE_I444_TOP_HAS_RIGHT = 1 << 0
EDGE_I444_LEFT_HAS_BOTTOM = 1 << 3

# coded-mode enums (spec order)
DC_PRED, VERT_PRED, HOR_PRED = 0, 1, 2
VERT_LEFT_PRED = 8
SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED = 9, 10, 11, 12
FILTER_PRED = 13

MODE_TO_ANGLE = [90, 180, 45, 135, 113, 157, 203, 67]

# needs_left, needs_top, needs_topleft, needs_topright, needs_bottomleft
EDGES = {
    ip.DC_PRED: (1, 1, 0, 0, 0),
    ip.VERT_PRED: (0, 1, 0, 0, 0),
    ip.HOR_PRED: (1, 0, 0, 0, 0),
    ip.LEFT_DC_PRED: (1, 0, 0, 0, 0),
    ip.TOP_DC_PRED: (0, 1, 0, 0, 0),
    ip.DC_128_PRED: (0, 0, 0, 0, 0),
    ip.Z1_PRED: (0, 1, 1, 1, 0),
    ip.Z2_PRED: (1, 1, 1, 0, 0),
    ip.Z3_PRED: (1, 0, 1, 0, 1),
    ip.SMOOTH_PRED: (1, 1, 0, 0, 0),
    ip.SMOOTH_V_PRED: (1, 1, 0, 0, 0),
    ip.SMOOTH_H_PRED: (1, 1, 0, 0, 0),
    ip.PAETH_PRED: (1, 1, 1, 0, 0),
    ip.FILTER_PRED: (1, 1, 1, 0, 0),
}


def prepare_intra_edges(x, have_left, y, have_top, w, h, edge_flags,
                        plane, px, py, mode, angle, tw, th,
                        filter_edge_flag, bitdepth):
    """x/y: block pos in 4px units (within tile coords); w/h: tile col/row
    end in 4px units; plane: full-frame pixel array; (px, py): block's
    top-left pixel coords in the plane. Returns (impl_mode, angle_out,
    topleft buffer (int32, 257), center=128)."""
    out = np.zeros(257, np.int32)
    c = 128

    if VERT_PRED <= mode <= VERT_LEFT_PRED:
        angle = MODE_TO_ANGLE[mode - VERT_PRED] + 3 * angle
        if angle <= 90:
            mode = ip.Z1_PRED if angle < 90 and have_top else ip.VERT_PRED
        elif angle < 180:
            mode = ip.Z2_PRED
        else:
            mode = ip.Z3_PRED if angle > 180 and have_left else ip.HOR_PRED
    elif mode == DC_PRED:
        mode = [[ip.DC_128_PRED, ip.TOP_DC_PRED],
                [ip.LEFT_DC_PRED, ip.DC_PRED]][have_left][have_top]
    elif mode == PAETH_PRED:
        mode = [[ip.DC_128_PRED, ip.VERT_PRED],
                [ip.HOR_PRED, ip.PAETH_PRED]][have_left][have_top]
    elif mode == SMOOTH_PRED:
        mode = ip.SMOOTH_PRED
    elif mode == SMOOTH_V_PRED:
        mode = ip.SMOOTH_V_PRED
    elif mode == SMOOTH_H_PRED:
        mode = ip.SMOOTH_H_PRED
    elif mode == FILTER_PRED:
        mode = ip.FILTER_PRED

    needs_left, needs_top, needs_topleft, needs_topright, needs_bottomleft \
        = EDGES[mode]

    plane = plane
    have_top_for_read = have_top and (needs_top or needs_topleft or
                                      (needs_left and not have_left))

    def dst_top(i):
        return int(plane[py - 1, px + i])

    if needs_left:
        sz = th << 2
        if have_left:
            px_have = min(sz, (h - y) << 2)
            for i in range(px_have):
                out[c - sz + sz - 1 - i] = plane[py + i, px - 1]
            if px_have < sz:
                out[c - sz:c - px_have] = out[c - px_have]
        else:
            fill = dst_top(0) if have_top_for_read else \
                ((1 << bitdepth) >> 1) + 1
            out[c - sz:c] = fill
        if needs_bottomleft:
            have_bl = 0 if (not have_left or y + th >= h) else \
                (edge_flags & EDGE_I444_LEFT_HAS_BOTTOM)
            if have_bl:
                px_have = min(sz, (h - y - th) << 2)
                for i in range(px_have):
                    out[c - sz - 1 - i] = plane[py + sz + i, px - 1]
                if px_have < sz:
                    out[c - 2 * sz:c - sz - px_have] = out[c - sz - px_have]
            else:
                out[c - 2 * sz:c - sz] = out[c - sz]

    if needs_top:
        sz = tw << 2
        if have_top:
            px_have = min(sz, (w - x) << 2)
            out[c + 1:c + 1 + px_have] = \
                plane[py - 1, px:px + px_have].astype(np.int32)
            if px_have < sz:
                out[c + 1 + px_have:c + 1 + sz] = out[c + px_have]
        else:
            fill = int(plane[py, px - 1]) if have_left else \
                ((1 << bitdepth) >> 1) - 1
            out[c + 1:c + 1 + sz] = fill
        if needs_topright:
            have_tr = 0 if (not have_top or x + tw >= w) else \
                (edge_flags & EDGE_I444_TOP_HAS_RIGHT)
            if have_tr:
                px_have = min(sz, (w - x - tw) << 2)
                out[c + 1 + sz:c + 1 + sz + px_have] = \
                    plane[py - 1, px + sz:px + sz + px_have].astype(np.int32)
                if px_have < sz:
                    out[c + 1 + sz + px_have:c + 1 + 2 * sz] = \
                        out[c + sz + px_have]
            else:
                out[c + 1 + sz:c + 1 + 2 * sz] = out[c + sz]

    if needs_topleft:
        if have_left:
            out[c] = dst_top(-1) if have_top else plane[py, px - 1]
        else:
            out[c] = dst_top(0) if have_top else (1 << bitdepth) >> 1
        if mode == ip.Z2_PRED and tw + th >= 6 and filter_edge_flag:
            out[c] = ((int(out[c - 1]) + int(out[c + 1])) * 5 +
                      int(out[c]) * 6 + 8) >> 4

    return mode, angle, out, c
