"""Deblocking edge/level map construction (dense-array formulation of dav1d
src/lf_mask.c mask_edges_intra/chroma + level cache fill).

Replays the tile's decoded blocks in order, producing per-4x4-edge filter
size indices and per-4x4 levels that ops/ref/loopfilter.py (and the TPU
deblock kernel) consume.
"""
from __future__ import annotations

import numpy as np

from .tilecoder import T_BLOCK_DIM, T_TXFM
from . import headers as h


class LfArrays:
    def __init__(self, w4, h4, cw4, ch4):
        self.edge_v_y = np.full((h4, w4), -1, np.int8)
        self.edge_h_y = np.full((h4, w4), -1, np.int8)
        self.edge_v_uv = np.full((ch4, cw4), -1, np.int8)
        self.edge_h_uv = np.full((ch4, cw4), -1, np.int8)
        self.lvl_y = np.zeros((h4, w4, 2), np.uint8)
        self.lvl_uv = np.zeros((ch4, cw4, 2), np.uint8)


def build_lf_arrays(seq, fhdr, coders, width, height) -> LfArrays:
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    w4 = (width + 3) >> 2
    h4 = (height + 3) >> 2
    cw4 = (w4 + ss_hor) >> ss_hor
    ch4 = (h4 + ss_ver) >> ss_ver
    lf = LfArrays(w4, h4, cw4, ch4)
    monochrome = seq.layout == h.PIXEL_LAYOUT_I400

    for coder in coders:
        # neighbour tx caps (dav1d t->a->tx_lpf_* / t->l.tx_lpf_*)
        a_y = np.full(w4 + 32, 2, np.uint8)
        a_uv = np.full(cw4 + 32, 1, np.uint8)
        l_y = np.full(32, 2, np.uint8)
        l_uv = np.full(32, 1, np.uint8)
        cur_sbrow = -1
        for b in coder.blocks:
            sbrow = b.by // coder.sb_step
            if sbrow != cur_sbrow:
                cur_sbrow = sbrow
                l_y[:] = 2
                l_uv[:] = 1
            b_dim = T_BLOCK_DIM[b.bs]
            bx, by = b.bx, b.by
            bw4 = min(w4 - bx, int(b_dim[0]))
            bh4 = min(h4 - by, int(b_dim[1]))
            if bw4 <= 0 or bh4 <= 0:
                continue
            by4 = by & 31

            t_dim = T_TXFM[b.tx]
            tw, th = int(t_dim[0]), int(t_dim[1])
            twl4c = min(2, int(t_dim[2]))
            thl4c = min(2, int(t_dim[3]))

            lf.lvl_y[by:by + bh4, bx:bx + bw4, 0] = b.lflvl4[0]
            lf.lvl_y[by:by + bh4, bx:bx + bw4, 1] = b.lflvl4[1]

            # left block edge
            for y in range(bh4):
                lf.edge_v_y[by + y, bx] = min(twl4c, int(l_y[by4 + y]))
            # top block edge
            for x in range(bw4):
                lf.edge_h_y[by, bx + x] = min(thl4c, int(a_y[bx + x]))
            # inner tx edges
            for xi in range(tw, bw4, tw):
                lf.edge_v_y[by:by + bh4, bx + xi] = twl4c
            for yi in range(th, bh4, th):
                lf.edge_h_y[by + yi, bx:bx + bw4] = thl4c
            a_y[bx:bx + bw4] = thl4c
            l_y[by4:by4 + bh4] = twl4c

            if monochrome:
                continue
            full_bw4, full_bh4 = int(b_dim[0]), int(b_dim[1])
            has_chroma = ((full_bw4 > ss_hor or bx & 1) and
                          (full_bh4 > ss_ver or by & 1))
            if not has_chroma:
                continue
            cbx = bx >> ss_hor
            cby = by >> ss_ver
            cby4 = by4 >> ss_ver
            cbw4 = min(cw4 - cbx, (full_bw4 + ss_hor) >> ss_hor)
            cbh4 = min(ch4 - cby, (full_bh4 + ss_ver) >> ss_ver)
            if cbw4 <= 0 or cbh4 <= 0:
                continue
            uv_t_dim = T_TXFM[b.uvtx]
            ctw, cth = int(uv_t_dim[0]), int(uv_t_dim[1])
            ctwl4c = 1 if int(uv_t_dim[2]) else 0
            cthl4c = 1 if int(uv_t_dim[3]) else 0

            lf.lvl_uv[cby:cby + cbh4, cbx:cbx + cbw4, 0] = b.lflvl4[2]
            lf.lvl_uv[cby:cby + cbh4, cbx:cbx + cbw4, 1] = b.lflvl4[3]

            for y in range(cbh4):
                lf.edge_v_uv[cby + y, cbx] = min(ctwl4c, int(l_uv[cby4 + y]))
            for x in range(cbw4):
                lf.edge_h_uv[cby, cbx + x] = min(cthl4c, int(a_uv[cbx + x]))
            for xi in range(ctw, cbw4, ctw):
                lf.edge_v_uv[cby:cby + cbh4, cbx + xi] = ctwl4c
            for yi in range(cth, cbh4, cth):
                lf.edge_h_uv[cby + yi, cbx:cbx + cbw4] = cthl4c
            a_uv[cbx:cbx + cbw4] = cthl4c
            l_uv[cby4:cby4 + cbh4] = ctwl4c

    return lf
