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


def _decomp_tx(txw, txh, stepw, steph, from_tx, depth, y_off, x_off, masks,
               y0, x0):
    """dav1d lf_mask.c decomp_tx:39 — dense 32x32 formulation."""
    t_dim = T_TXFM[from_tx]
    w, hh = int(t_dim[0]), int(t_dim[1])
    is_split = 0 if (from_tx == 0 or depth > 1) else \
        (masks[depth] >> (y_off * 4 + x_off)) & 1
    if is_split:
        sub = int(t_dim[6])
        htw4, hth4 = w >> 1, hh >> 1
        _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                   y_off * 2, x_off * 2, masks, y0, x0)
        if w >= hh:
            _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                       y_off * 2, x_off * 2 + 1, masks, y0, x0 + htw4)
        if hh >= w:
            _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                       y_off * 2 + 1, x_off * 2, masks, y0 + hth4, x0)
            if w >= hh:
                _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                           y_off * 2 + 1, x_off * 2 + 1, masks,
                           y0 + hth4, x0 + htw4)
    else:
        lw, lh = min(2, int(t_dim[2])), min(2, int(t_dim[3]))
        txw[y0:y0 + hh, x0:x0 + w] = lw
        txh[y0:y0 + hh, x0:x0 + w] = lh
        stepw[y0:y0 + hh, x0] = w
        steph[y0, x0:x0 + w] = hh


class LfArrays:
    def __init__(self, w4, h4, cw4, ch4):
        self.edge_v_y = np.full((h4, w4), -1, np.int8)
        self.edge_h_y = np.full((h4, w4), -1, np.int8)
        self.edge_v_uv = np.full((ch4, cw4), -1, np.int8)
        self.edge_h_uv = np.full((ch4, cw4), -1, np.int8)
        self.lvl_y = np.zeros((h4, w4, 2), np.uint8)
        self.lvl_uv = np.zeros((ch4, cw4, 2), np.uint8)


_lf_native_checked = False
_LF_TABS = None


def _lf_native():
    """Native builder (native/lf.cpp) or None."""
    global _lf_native_checked
    from .native import LIB
    if LIB is None or not hasattr(LIB, "lf_build"):
        return None
    if not _lf_native_checked:
        import ctypes as ct
        LIB.lf_build.restype = None
        LIB.lf_build.argtypes = [ct.c_void_p] * 4
        LIB.lf_cfg_size.restype = ct.c_int
        _lf_native_checked = True
    return LIB


def _build_lf_arrays_native(LIB, seq, coders, w4, h4, cw4, ch4, ss_hor,
                            ss_ver, monochrome) -> LfArrays:
    """One native call per tile over the dense block records, sharing
    the frame-global maps/edge arrays exactly like the Python walk."""
    from ..data.tables import TABLES
    lf = LfArrays(w4, h4, cw4, ch4)
    txw_map = np.full((h4 + 32, w4 + 32), 2, np.uint8)
    txh_map = np.full((h4 + 32, w4 + 32), 2, np.uint8)
    ctxw_map = np.full((ch4 + 32, cw4 + 32), 1, np.uint8)
    ctxh_map = np.full((ch4 + 32, cw4 + 32), 1, np.uint8)
    global _LF_TABS
    if _LF_TABS is None:
        keep = [np.ascontiguousarray(TABLES["block_dimensions"],
                                     np.uint8),
                np.ascontiguousarray(TABLES["txfm_dimensions"],
                                     np.uint8)]
        _LF_TABS = (np.array([a.ctypes.data for a in keep], np.uint64),
                    keep)
    tabs = _LF_TABS[0]
    outp = np.array([a.ctypes.data for a in
                     (lf.edge_v_y, lf.edge_h_y, lf.edge_v_uv,
                      lf.edge_h_uv, lf.lvl_y, lf.lvl_uv, txw_map,
                      txh_map, ctxw_map, ctxh_map)], np.uint64)
    for coder in coders:
        blk = coder.native_arrays[0]
        cfg = np.array([w4, h4, cw4, ch4, ss_hor, ss_ver,
                        int(monochrome), blk.shape[0]], np.int32)
        assert cfg.shape[0] == LIB.lf_cfg_size()
        LIB.lf_build(cfg.ctypes.data, tabs.ctypes.data, blk.ctypes.data,
                     outp.ctypes.data)
    return lf


def build_lf_arrays(seq, fhdr, coders, width, height) -> LfArrays:
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    w4 = (width + 3) >> 2
    h4 = (height + 3) >> 2
    cw4 = (w4 + ss_hor) >> ss_hor
    ch4 = (h4 + ss_ver) >> ss_ver
    monochrome = seq.layout == h.PIXEL_LAYOUT_I400
    LIB = _lf_native()
    if LIB is not None and all(
            getattr(c, "native_arrays", None) is not None
            for c in coders):
        return _build_lf_arrays_native(LIB, seq, coders, w4, h4, cw4,
                                       ch4, ss_hor, ss_ver, monochrome)
    lf = LfArrays(w4, h4, cw4, ch4)

    # frame-global per-4x4 tx-size-class maps: neighbour lookups then work
    # across tile boundaries exactly like dav1d's tx_lpf edge fixups
    # (decode.c:2776-2790). Defaults 2 (luma) / 1 (chroma) match the
    # reset_context values used at frame edges (where edges are unfiltered).
    txw_map = np.full((h4 + 32, w4 + 32), 2, np.uint8)
    txh_map = np.full((h4 + 32, w4 + 32), 2, np.uint8)
    ctxw_map = np.full((ch4 + 32, cw4 + 32), 1, np.uint8)
    ctxh_map = np.full((ch4 + 32, cw4 + 32), 1, np.uint8)

    # neighbour lookups (frame edges use the reset defaults; tile
    # boundaries read the neighbour tile's values, matching the
    # tx_lpf_right_edge / start_of_tile_row fixups in lf_apply_tmpl.c)
    def l_y(by_abs, bx_abs):
        return 2 if bx_abs == 0 else int(txw_map[by_abs, bx_abs - 1])

    def a_y(by_abs, bx_abs):
        return 2 if by_abs == 0 else int(txh_map[by_abs - 1, bx_abs])

    def l_uv(cby_abs, cbx_abs):
        return 1 if cbx_abs == 0 else int(ctxw_map[cby_abs, cbx_abs - 1])

    def a_uv(cby_abs, cbx_abs):
        return 1 if cby_abs == 0 else int(ctxh_map[cby_abs - 1, cbx_abs])

    for coder in coders:
        for b in coder.blocks:
            b_dim = T_BLOCK_DIM[b.bs]
            bx, by = b.bx, b.by
            bw4 = min(w4 - bx, int(b_dim[0]))
            bh4 = min(h4 - by, int(b_dim[1]))
            if bw4 <= 0 or bh4 <= 0:
                continue

            lf.lvl_y[by:by + bh4, bx:bx + bw4, 0] = b.lflvl4[0]
            lf.lvl_y[by:by + bh4, bx:bx + bw4, 1] = b.lflvl4[1]

            if b.intra:
                t_dim = T_TXFM[b.tx]
                tw, th = int(t_dim[0]), int(t_dim[1])
                twl4c = min(2, int(t_dim[2]))
                thl4c = min(2, int(t_dim[3]))

                # left block edge
                for y in range(bh4):
                    lf.edge_v_y[by + y, bx] = min(twl4c, l_y(by + y, bx))
                # top block edge
                for x in range(bw4):
                    lf.edge_h_y[by, bx + x] = min(thl4c, a_y(by, bx + x))
                # inner tx edges
                for xi in range(tw, bw4, tw):
                    lf.edge_v_y[by:by + bh4, bx + xi] = twl4c
                for yi in range(th, bh4, th):
                    lf.edge_h_y[by + yi, bx:bx + bw4] = thl4c
                txw_map[by:by + bh4, bx:bx + bw4] = twl4c
                txh_map[by:by + bh4, bx:bx + bw4] = thl4c
            else:
                # dav1d lf_mask.c mask_edges_inter:82 (dense formulation)
                txw = np.zeros((32, 32), np.int32)
                txh = np.zeros((32, 32), np.int32)
                stepw = np.zeros((32, 32), np.int32)
                steph = np.zeros((32, 32), np.int32)
                ytx_dim = T_TXFM[b.max_ytx]
                yw, yh = int(ytx_dim[0]), int(ytx_dim[1])
                masks = (b.tx_split0, b.tx_split1)
                yy = 0
                y_off = 0
                while yy < bh4:
                    xx = 0
                    x_off = 0
                    while xx < bw4:
                        _decomp_tx(txw, txh, stepw, steph, b.max_ytx, 0,
                                   y_off, x_off, masks, yy, xx)
                        xx += yw
                        x_off += 1
                    yy += yh
                    y_off += 1

                for y in range(bh4):
                    lf.edge_v_y[by + y, bx] = min(int(txw[y, 0]),
                                                  l_y(by + y, bx))
                for x in range(bw4):
                    lf.edge_h_y[by, bx + x] = min(int(txh[0, x]),
                                                  a_y(by, bx + x))
                if not b.skip:
                    for y in range(bh4):
                        ltx = int(txw[y, 0])
                        step = int(stepw[y, 0])
                        x = step
                        while x < bw4:
                            rtx = int(txw[y, x])
                            lf.edge_v_y[by + y, bx + x] = min(rtx, ltx)
                            ltx = rtx
                            step = int(stepw[y, x])
                            x += step
                    for x in range(bw4):
                        ttx = int(txh[0, x])
                        step = int(steph[0, x])
                        y = step
                        while y < bh4:
                            btx = int(txh[y, x])
                            lf.edge_h_y[by + y, bx + x] = min(ttx, btx)
                            ttx = btx
                            step = int(steph[y, x])
                            y += step
                txw_map[by:by + bh4, bx:bx + bw4] = txw[:bh4, :bw4]
                txh_map[by:by + bh4, bx:bx + bw4] = txh[:bh4, :bw4]

            if monochrome:
                continue
            full_bw4, full_bh4 = int(b_dim[0]), int(b_dim[1])
            has_chroma = ((full_bw4 > ss_hor or bx & 1) and
                          (full_bh4 > ss_ver or by & 1))
            if not has_chroma:
                continue
            cbx = bx >> ss_hor
            cby = by >> ss_ver
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
                lf.edge_v_uv[cby + y, cbx] = min(ctwl4c, l_uv(cby + y, cbx))
            for x in range(cbw4):
                lf.edge_h_uv[cby, cbx + x] = min(cthl4c, a_uv(cby, cbx + x))
            if b.intra or not b.skip:  # dav1d mask_edges_chroma skip_inter
                for xi in range(ctw, cbw4, ctw):
                    lf.edge_v_uv[cby:cby + cbh4, cbx + xi] = ctwl4c
                for yi in range(cth, cbh4, cth):
                    lf.edge_h_uv[cby + yi, cbx:cbx + cbw4] = cthl4c
            ctxw_map[cby:cby + cbh4, cbx:cbx + cbw4] = ctwl4c
            ctxh_map[cby:cby + cbh4, cbx:cbx + cbw4] = cthl4c

    return lf
