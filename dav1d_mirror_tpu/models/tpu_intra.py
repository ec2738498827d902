"""Device intra reconstruction: host-planned wavefront scan.

The sequential-neighbour dependency of intra prediction (SURVEY hard
part #2; dav1d src/recon_tmpl.c:1195-1596 interleaves per block) is
re-expressed TPU-first: after the host entropy pass, every prediction
unit's geometry, mode and edge availability are known, so the host
derives a wave index per unit (1 + max wave of any cell its edges can
read) and the device runs ONE `lax.scan` over waves — each step
predicts all units of that wave in a single batch (ops/ipred_tpu
kernels), adds the pre-computed batched-itx residuals and scatters into
the planes. Palette pixels don't depend on reconstruction and are
pre-placed on the host; filter-intra cells keep a separate prediction
plane for their in-block sequencing (they read *predicted*, not
reconstructed, in-block neighbours — dav1d filter_intra_c semantics).

Bit-exact with models/ref_decoder._recon_tile on intra blocks.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..data.tables import TABLES
from ..host import headers as h
from ..ops import ipred_tpu as P
from ..ops.ipred_tpu import (TILE, PAD, PADT, NPARAMS,
                             DC_PRED, LEFT_DC_PRED, TOP_DC_PRED,
                             DC_128_PRED, VERT_PRED, HOR_PRED, Z1_PRED,
                             Z2_PRED, Z3_PRED, SMOOTH_PRED, SMOOTH_V_PRED,
                             SMOOTH_H_PRED, PAETH_PRED, FILTER_PRED,
                             CFL_MODE, PAL_MODE)
from ..ops.ref import ipred as ipr
from ..ops.ref.ipred_prepare import MODE_TO_ANGLE, EDGES
from ..ops.itx import itx_residual

T_BLOCK_DIM = TABLES["block_dimensions"]
T_TXFM = TABLES["txfm_dimensions"]
SMOOTH_MODES = (9, 10, 11)      # coded modes
ANGLE_SMOOTH_EDGE_FLAG = 512
CFL_CODED = 13                  # tilecoder CFL_PRED
FILTER_CODED = 13               # tilecoder FILTER_PRED (y_mode)


# ------------------------------------------------------------------
# host parameter precompute
# ------------------------------------------------------------------
def _ctz(v):
    return (v & -v).bit_length() - 1


def _dc_params(p, mode, w, h, bitdepth):
    """ops/ref/ipred.dc_value as bias/shift/mult (host precompute)."""
    if mode == DC_128_PRED:
        p[P.P_DC_BIAS] = (1 << bitdepth) >> 1 if bitdepth > 8 else 128
        p[P.P_DC_MULT] = 1
        return
    if mode == TOP_DC_PRED:
        p[P.P_DC_BIAS] = w >> 1
        p[P.P_DC_USE_TOP] = 1
        p[P.P_DC_SH1] = _ctz(w)
    elif mode == LEFT_DC_PRED:
        p[P.P_DC_BIAS] = h >> 1
        p[P.P_DC_USE_LEFT] = 1
        p[P.P_DC_SH1] = _ctz(h)
    else:
        p[P.P_DC_BIAS] = (w + h) >> 1
        p[P.P_DC_USE_TOP] = p[P.P_DC_USE_LEFT] = 1
        p[P.P_DC_SH1] = _ctz(w + h)
    p[P.P_DC_MULT] = 1
    if mode == DC_PRED and w != h:
        if bitdepth == 8:
            m2, m4, base = 0x5556, 0x3334, 16
        else:
            m2, m4, base = 0xAAAB, 0x6667, 17
        p[P.P_DC_MULT] = m4 if (w > h * 2 or h > w * 2) else m2
        p[P.P_DC_SH2] = base


def _z_params(p, mode, w, h, angle_in, max_w, max_h):
    """Z-mode derived-edge parameters (_z1/_z2/_z3 headers)."""
    is_sm = (angle_in >> 9) & 1
    eief = angle_in >> 10
    angle = angle_in & 511
    gu = ipr.get_upsample
    gf = ipr.get_filter_strength
    DR = TABLES["dr_intra_derivative"]
    p[P.P_FLT_TO_T] = p[P.P_FLT_TO_L] = 1
    p[P.P_UPS_TO_T] = p[P.P_UPS_TO_L] = 1
    if mode == Z1_PRED:
        dx = int(DR[angle >> 1])
        us = gu(w + h, 90 - angle, is_sm) if eief else 0
        p[P.P_US_ABOVE] = us
        if us:
            p[P.P_UPS_HSZ_T] = w + h
            p[P.P_UPS_FRM_T] = -1
            p[P.P_UPS_TO_T] = w + min(w, h)
            p[P.P_MAX_BASE_X] = 2 * (w + h) - 2
            dx <<= 1
        else:
            fs = gf(w + h, 90 - angle, is_sm) if eief else 0
            p[P.P_FS_ABOVE] = fs
            if fs:
                p[P.P_FLT_SZ_T] = w + h
                p[P.P_FLT_LIM_FROM_T] = 0
                p[P.P_FLT_LIM_TO_T] = w + h
                p[P.P_FLT_FRM_T] = -1
                p[P.P_FLT_TO_T] = w + min(w, h)
                p[P.P_MAX_BASE_X] = w + h - 1
            else:
                p[P.P_MAX_BASE_X] = w + min(w, h) - 1
        p[P.P_DX] = dx
    elif mode == Z2_PRED:
        dy = int(DR[(angle - 90) >> 1])
        dx = int(DR[(180 - angle) >> 1])
        usl = gu(w + h, 180 - angle, is_sm) if eief else 0
        usa = gu(w + h, angle - 90, is_sm) if eief else 0
        p[P.P_US_LEFT] = usl
        p[P.P_US_ABOVE] = usa
        if usa:
            dx <<= 1
        else:
            p[P.P_FS_ABOVE] = gf(w + h, angle - 90, is_sm) if eief else 0
            p[P.P_FLT_LIM_TO_T] = max_w
        if usl:
            dy <<= 1
        else:
            p[P.P_FS_LEFT] = gf(w + h, 180 - angle, is_sm) if eief else 0
            p[P.P_FLT_LIM_TO_L] = max_h
        p[P.P_DX] = dx
        p[P.P_DY] = dy
    elif mode == Z3_PRED:
        dy = int(DR[(270 - angle) >> 1])
        us = gu(w + h, angle - 180, is_sm) if eief else 0
        p[P.P_US_LEFT] = us
        if us:
            p[P.P_UPS_HSZ_L] = w + h
            p[P.P_UPS_FRM_L] = max(w - h, 0)
            p[P.P_UPS_TO_L] = w + h + 1
            p[P.P_MAX_BASE_Y] = 2 * (w + h) - 2
            dy <<= 1
        else:
            fs = gf(w + h, angle - 180, is_sm) if eief else 0
            p[P.P_FS_LEFT] = fs
            if fs:
                p[P.P_FLT_SZ_L] = w + h
                p[P.P_FLT_LIM_FROM_L] = 0
                p[P.P_FLT_LIM_TO_L] = w + h
                p[P.P_FLT_FRM_L] = max(w - h, 0)
                p[P.P_FLT_TO_L] = w + h + 1
                p[P.P_MAX_BASE_Y] = w + h - 1
            else:
                p[P.P_MAX_BASE_Y] = h + min(w, h) - 1
        p[P.P_DY] = dy


def _convert_mode(mode, angle, have_left, have_top):
    """ipred_prepare coded->impl mode conversion; returns (m, angle)."""
    if 1 <= mode <= 8:
        angle = MODE_TO_ANGLE[mode - 1] + 3 * angle
        if angle <= 90:
            return (Z1_PRED if angle < 90 and have_top else VERT_PRED,
                    angle)
        if angle < 180:
            return Z2_PRED, angle
        return (Z3_PRED if angle > 180 and have_left else HOR_PRED, angle)
    if mode == 0:
        return [[DC_128_PRED, TOP_DC_PRED],
                [LEFT_DC_PRED, DC_PRED]][have_left][have_top], angle
    if mode == 12:
        return [[DC_128_PRED, VERT_PRED],
                [HOR_PRED, PAETH_PRED]][have_left][have_top], angle
    return {9: SMOOTH_PRED, 10: SMOOTH_V_PRED, 11: SMOOTH_H_PRED,
            13: FILTER_PRED}[mode], angle


def _edge_geom(p, impl_mode, x, y, w_t, h_t, edge_flags, tw, th, ief):
    """prepare_intra_edges availability geometry into the param vector.
    x/y unit pos in 4px units (plane coords); w_t/h_t tile col/row end."""
    have_left = int(p[P.P_HAVE_LEFT])
    have_top = int(p[P.P_HAVE_TOP])
    nl, nt, ntl, ntr, nbl = EDGES[impl_mode]
    p[P.P_NEEDS_LEFT] = nl
    p[P.P_NEEDS_TOP] = nt
    p[P.P_NEEDS_TL] = ntl
    p[P.P_NEEDS_TR] = ntr
    p[P.P_NEEDS_BL] = nbl
    sz_l = th << 2
    sz_t = tw << 2
    p[P.P_PXH_LEFT] = min(sz_l, (h_t - y) << 2) if have_left else 0
    have_bl = 0 if (not have_left or y + th >= h_t) else \
        (edge_flags & 8)
    p[P.P_PXH_BL] = min(sz_l, (h_t - y - th) << 2) if have_bl else 0
    p[P.P_PXH_TOP] = min(sz_t, (w_t - x) << 2) if have_top else 0
    have_tr = 0 if (not have_top or x + tw >= w_t) else \
        (edge_flags & 1)
    p[P.P_PXH_TR] = min(sz_t, (w_t - x - tw) << 2) if have_tr else 0
    p[P.P_HTFR] = int(have_top and (nt or ntl or (nl and not have_left)))
    p[P.P_Z2TLF] = int(ntl and impl_mode == Z2_PRED and tw + th >= 6 and
                       ief)


# ------------------------------------------------------------------
# plan builder
# ------------------------------------------------------------------
class IntraPlan:
    def __init__(self):
        self.items = []         # (param_vec, wave)
        self.filter_items = []
        self.max_wave = 0

    def finalize(self):
        """bucket by wave into padded (n_waves, K, NPARAMS) arrays."""
        n_waves = self.max_wave + 1

        def bucket(lst):
            per = [[] for _ in range(n_waves)]
            for pv, wv in lst:
                per[wv].append(pv)
            k = max((len(x) for x in per), default=0)
            k = max(k, 1)
            out = np.zeros((n_waves, k, NPARAMS), np.int32)
            for w, rows in enumerate(per):
                for i, pv in enumerate(rows):
                    out[w, i] = pv
            return out

        return bucket(self.items), bucket(self.filter_items), n_waves


def build_intra_plan(seq, fhdr, coder, done, plan: IntraPlan):
    """Emit prediction units for one tile's intra blocks into `plan`.

    `done`: list of 3 int32 grids (plane 4px-unit dims, frame-wide)
    holding the wave at which each cell completes (0 = ready at start).
    Shared across tiles (tiles are spatially disjoint; edges never cross
    tile starts)."""
    bitdepth = seq.bitdepth
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    monochrome = seq.layout == h.PIXEL_LAYOUT_I400
    keyframe = fhdr.frame_type in (0, 2)
    ief = seq.intra_edge_filter
    ief_flag = ief << 10
    bw, bh = coder.bw, coder.bh
    ch_w = (bw + ss_hor) >> ss_hor
    ch_h = (bh + ss_ver) >> ss_ver
    sb_step = coder.sb_step

    a_mode = np.zeros(bw + 32, np.uint8)
    a_intra = np.full(bw + 32, 1 if keyframe else 0, np.uint8)
    a_uvmode = np.zeros(bw + 32, np.uint8)
    l_mode = np.zeros(32, np.uint8)
    l_intra = np.full(32, 1 if keyframe else 0, np.uint8)
    l_uvmode = np.zeros(32, np.uint8)
    cur_sbrow = -1

    def sm_flag(mode_arr, intra_arr, idx):
        if not intra_arr[idx]:
            return 0
        return ANGLE_SMOOTH_EDGE_FLAG if mode_arr[idx] in SMOOTH_MODES \
            else 0

    def sm_uv_flag(uvmode_arr, idx):
        return ANGLE_SMOOTH_EDGE_FLAG if uvmode_arr[idx] in SMOOTH_MODES \
            else 0

    def dep_wave(pl, x, y, tw, th, w_t, h_t, have_left, have_top,
                 extra=0):
        g = done[pl]
        mx = extra
        if have_top:
            x0 = max(x - 1, 0)
            x1 = min(x + 2 * tw, w_t)
            seg = g[y - 1, x0:x1]
            if seg.size:
                mx = max(mx, int(seg.max()))
        if have_left:
            y1 = min(y + 2 * th, h_t)
            seg = g[y:y1, x - 1]
            if seg.size:
                mx = max(mx, int(seg.max()))
        return mx + 1

    def mark_done(pl, x, y, tw, th, wave):
        g = done[pl]
        g[y:y + th, x:x + tw] = wave
        plan.max_wave = max(plan.max_wave, wave)

    def subtile(p0, wave, uw_px, uh_px, out):
        for oy in range(0, uh_px, TILE):
            for ox in range(0, uw_px, TILE):
                p = p0.copy()
                p[P.P_OX] = ox
                p[P.P_OY] = oy
                p[P.P_PX] = p0[P.P_PX] + ox
                p[P.P_PY] = p0[P.P_PY] + oy
                p[P.P_VALID] = 1
                out.append((p, wave))

    for b in coder.blocks:
        sbrow = b.by // sb_step
        if sbrow != cur_sbrow:
            cur_sbrow = sbrow
            l_mode[:] = 0
            l_intra[:] = 1 if keyframe else 0
            l_uvmode[:] = 0

        b_dim = T_BLOCK_DIM[b.bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx, by = b.bx, b.by
        by4 = by & 31
        cby4 = by4 >> ss_ver

        if not b.intra:
            a_intra[bx:bx + bw4] = 0
            l_intra[by4:by4 + bh4] = 0
            if not monochrome:
                cbw4_i = (bw4 + ss_hor) >> ss_hor
                cbh4_i = (bh4 + ss_ver) >> ss_ver
                if (bw4 > ss_hor or bx & 1) and (bh4 > ss_ver or by & 1):
                    a_uvmode[(bx >> ss_hor):(bx >> ss_hor) + cbw4_i] = 0
                    l_uvmode[cby4:cby4 + cbh4_i] = 0
            continue

        w4 = min(bw4, bw - bx)
        h4 = min(bh4, bh - by)
        cw4 = (w4 + ss_hor) >> ss_hor
        ch4 = (h4 + ss_ver) >> ss_ver
        cbw4 = (bw4 + ss_hor) >> ss_hor
        cbh4 = (bh4 + ss_ver) >> ss_ver
        has_chroma = (not monochrome and
                      (bw4 > ss_hor or bx & 1) and (bh4 > ss_ver or by & 1))
        t_dim = T_TXFM[b.tx]
        uv_t_dim = T_TXFM[b.uvtx]
        tw, th = int(t_dim[0]), int(t_dim[1])
        ctw, cth = int(uv_t_dim[0]), int(uv_t_dim[1])
        is_cfl = has_chroma and b.uv_mode == CFL_CODED

        for init_y in range(0, h4, 16):
            sub_h4 = min(h4, 16 + init_y)
            sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
            for init_x in range(0, w4, 16):
                sub_w4 = min(w4, init_x + 16)
                intra_flags = (sm_flag(a_mode, a_intra, bx + init_x) |
                               sm_flag(l_mode, l_intra, by4 + init_y) |
                               ief_flag)
                sb_has_tr = 1 if init_x + 16 < w4 else 0 if init_y else \
                    (b.edge_flags & 1)
                sb_has_bl = 0 if init_x else 1 if init_y + 16 < h4 else \
                    (b.edge_flags & 8)

                # ---- luma ----
                y = init_y
                while y < sub_h4:
                    x = init_x
                    while x < sub_w4:
                        ux, uy = bx + x, by + y
                        have_left = int(ux > coder.col_start)
                        have_top = int(uy > coder.row_start)
                        p0 = np.zeros(NPARAMS, np.int32)
                        p0[P.P_PLANE] = 0
                        p0[P.P_PX] = ux * 4
                        p0[P.P_PY] = uy * 4
                        p0[P.P_W] = tw * 4
                        p0[P.P_H] = th * 4
                        p0[P.P_HAVE_LEFT] = have_left
                        p0[P.P_HAVE_TOP] = have_top

                        if b.pal_sz[0]:
                            # palette pixels pre-placed; residual-only
                            wave = dep_wave(0, ux, uy, tw, th,
                                            coder.col_end, coder.row_end,
                                            have_left, have_top)
                            p0[P.P_MODE] = PAL_MODE
                            subtile(p0, wave, tw * 4, th * 4, plan.items)
                            mark_done(0, ux, uy, min(tw, bw - ux),
                                      min(th, bh - uy), wave)
                            x += tw
                            continue

                        edge_flags = (
                            (0 if ((y > init_y or not sb_has_tr) and
                                   (x + tw >= sub_w4)) else 1) |
                            (0 if (x > init_x or
                                   (not sb_has_bl and y + th >= sub_h4))
                             else 8))
                        m, angle = _convert_mode(b.y_mode, b.y_angle,
                                                 have_left, have_top)
                        _edge_geom(p0, m, ux, uy, coder.col_end,
                                   coder.row_end, edge_flags, tw, th, ief)
                        p0[P.P_MODE] = m
                        if m in (DC_PRED, LEFT_DC_PRED, TOP_DC_PRED,
                                 DC_128_PRED):
                            _dc_params(p0, m, tw * 4, th * 4, bitdepth)
                        elif m in (Z1_PRED, Z2_PRED, Z3_PRED):
                            _z_params(p0, m, tw * 4, th * 4,
                                      angle | intra_flags,
                                      4 * bw - 4 * ux, 4 * bh - 4 * uy)

                        if m == FILTER_PRED:
                            p0[P.P_MISC] = b.y_angle
                            p0[P.P_BPX] = ux * 4
                            p0[P.P_BPY] = uy * 4
                            base_wave = dep_wave(
                                0, ux, uy, tw, th, coder.col_end,
                                coder.row_end, have_left, have_top)
                            cell_w = np.zeros((th, tw), np.int64)
                            for cy in range(th):
                                for cx in range(tw):
                                    wv = base_wave
                                    if cx:
                                        wv = max(wv,
                                                 int(cell_w[cy, cx - 1])
                                                 + 1)
                                    if cy:
                                        wv = max(wv,
                                                 int(cell_w[cy - 1, cx])
                                                 + 1)
                                    cell_w[cy, cx] = wv
                                    p = p0.copy()
                                    p[P.P_PX] = (ux + cx) * 4
                                    p[P.P_PY] = (uy + cy) * 4
                                    p[P.P_OX] = cx * 4
                                    p[P.P_OY] = cy * 4
                                    p[P.P_VALID] = 1
                                    plan.filter_items.append((p, wv))
                            wave = int(cell_w.max())
                        else:
                            wave = dep_wave(0, ux, uy, tw, th,
                                            coder.col_end, coder.row_end,
                                            have_left, have_top)
                            subtile(p0, wave, tw * 4, th * 4, plan.items)
                        mark_done(0, ux, uy, min(tw, bw - ux),
                                  min(th, bh - uy), wave)
                        x += tw
                    y += th

                if not has_chroma:
                    continue

                # ---- CFL prediction (whole chroma block, first pass) ----
                cbx = bx >> ss_hor
                cby = by >> ss_ver
                c_colstart = coder.col_start >> ss_hor
                c_rowstart = coder.row_start >> ss_ver
                c_colend = coder.col_end >> ss_hor
                c_rowend = coder.row_end >> ss_ver
                if is_cfl and init_x == 0 and init_y == 0:
                    ysrc_x = 4 * (bx & ~ss_hor)
                    ysrc_y = 4 * (by & ~ss_ver)
                    furthest_r = ((cw4 << ss_hor) + tw - 1) & ~(tw - 1)
                    furthest_b = ((ch4 << ss_ver) + th - 1) & ~(th - 1)
                    w_pad = cbw4 - (furthest_r >> ss_hor)
                    h_pad = cbh4 - (furthest_b >> ss_ver)
                    lx0, ly0 = ysrc_x // 4, ysrc_y // 4
                    lw_ = min(cbw4 << ss_hor, bw - lx0)
                    lh_ = min(cbh4 << ss_ver, bh - ly0)
                    luma_wave = int(done[0][ly0:ly0 + lh_,
                                            lx0:lx0 + lw_].max())
                    for pl in range(2):
                        if not b.cfl_alpha[pl]:
                            continue
                        have_left = int(cbx > c_colstart)
                        have_top = int(cby > c_rowstart)
                        p0 = np.zeros(NPARAMS, np.int32)
                        p0[P.P_PLANE] = 1 + pl
                        p0[P.P_PX] = cbx * 4
                        p0[P.P_PY] = cby * 4
                        p0[P.P_W] = ctw * 4
                        p0[P.P_H] = cth * 4
                        p0[P.P_HAVE_LEFT] = have_left
                        p0[P.P_HAVE_TOP] = have_top
                        p0[P.P_MODE] = CFL_MODE
                        dc_m, _ = _convert_mode(0, 0, have_left, have_top)
                        _edge_geom(p0, dc_m, cbx, cby, c_colend, c_rowend,
                                   0, ctw, cth, 0)
                        _dc_params(p0, dc_m, ctw * 4, cth * 4, bitdepth)
                        p0[P.P_MISC] = b.cfl_alpha[pl]
                        p0[P.P_YSRC_X] = ysrc_x
                        p0[P.P_YSRC_Y] = ysrc_y
                        p0[P.P_CFL_WCL] = cbw4 * 4 - 4 * w_pad
                        p0[P.P_CFL_HCL] = cbh4 * 4 - 4 * h_pad
                        p0[P.P_CFL_LOG2SZ] = \
                            ((cbw4 * 4).bit_length() - 1) + \
                            ((cbh4 * 4).bit_length() - 1)
                        wave = dep_wave(1 + pl, cbx, cby, ctw, cth,
                                        c_colend, c_rowend, have_left,
                                        have_top, extra=luma_wave)
                        subtile(p0, wave, ctw * 4, cth * 4, plan.items)
                        mark_done(1 + pl, cbx, cby,
                                  min(ctw, ch_w - cbx),
                                  min(cth, ch_h - cby), wave)

                sm_uv_fl = (sm_uv_flag(a_uvmode, (bx + init_x) >> ss_hor) |
                            sm_uv_flag(l_uvmode,
                                       cby4 + (init_y >> ss_ver)))
                uv_sb_has_tr = (1 if ((init_x + 16) >> ss_hor) < cw4 else
                                0 if init_y else
                                b.edge_flags & (4 >> (seq.layout - 1)))
                uv_sb_has_bl = (0 if init_x else
                                1 if ((init_y + 16) >> ss_ver) < ch4 else
                                b.edge_flags & (32 >> (seq.layout - 1)))
                sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                max_w_uv = (4 * bw + ss_hor - 4 * (bx & ~ss_hor)) >> ss_hor
                max_h_uv = (4 * bh + ss_ver - 4 * (by & ~ss_ver)) >> ss_ver
                for pl in range(2):
                    y = init_y >> ss_ver
                    while y < sub_ch4:
                        x = init_x >> ss_hor
                        while x < sub_cw4:
                            xpos = (bx >> ss_hor) + x
                            ypos = (by >> ss_ver) + y
                            do_pred = not ((is_cfl and b.cfl_alpha[pl]) or
                                           b.pal_sz[1])
                            have_left = int(xpos > c_colstart)
                            have_top = int(ypos > c_rowstart)
                            p0 = np.zeros(NPARAMS, np.int32)
                            p0[P.P_PLANE] = 1 + pl
                            p0[P.P_PX] = xpos * 4
                            p0[P.P_PY] = ypos * 4
                            p0[P.P_W] = ctw * 4
                            p0[P.P_H] = cth * 4
                            p0[P.P_HAVE_LEFT] = have_left
                            p0[P.P_HAVE_TOP] = have_top
                            if do_pred:
                                edge_flags = (
                                    (0 if ((y > (init_y >> ss_ver) or
                                            not uv_sb_has_tr) and
                                           (x + ctw >= sub_cw4)) else 1) |
                                    (0 if (x > (init_x >> ss_hor) or
                                           (not uv_sb_has_bl and
                                            y + cth >= sub_ch4)) else 8))
                                uv_mode = 0 if is_cfl else b.uv_mode
                                m, angle = _convert_mode(
                                    uv_mode, b.uv_angle, have_left,
                                    have_top)
                                _edge_geom(p0, m, xpos, ypos, c_colend,
                                           c_rowend, edge_flags, ctw,
                                           cth, ief)
                                p0[P.P_MODE] = m
                                if m in (DC_PRED, LEFT_DC_PRED,
                                         TOP_DC_PRED, DC_128_PRED):
                                    _dc_params(p0, m, ctw * 4, cth * 4,
                                               bitdepth)
                                elif m in (Z1_PRED, Z2_PRED, Z3_PRED):
                                    _z_params(p0, m, ctw * 4, cth * 4,
                                              (angle | ief_flag) |
                                              sm_uv_fl, max_w_uv,
                                              max_h_uv)
                                wave = dep_wave(1 + pl, xpos, ypos, ctw,
                                                cth, c_colend, c_rowend,
                                                have_left, have_top)
                            else:
                                # cfl/palette-covered: residual-only
                                wave = int(done[1 + pl][ypos, xpos]) + 1
                                p0[P.P_MODE] = PAL_MODE
                            subtile(p0, wave, ctw * 4, cth * 4,
                                    plan.items)
                            mark_done(1 + pl, xpos, ypos,
                                      min(ctw, ch_w - xpos),
                                      min(cth, ch_h - ypos), wave)
                            x += ctw
                        y += cth

        y_mode_nofilt = 0 if b.y_mode == FILTER_CODED else b.y_mode
        a_mode[bx:bx + bw4] = y_mode_nofilt
        a_intra[bx:bx + bw4] = 1
        l_mode[by4:by4 + bh4] = y_mode_nofilt
        l_intra[by4:by4 + bh4] = 1
        if has_chroma:
            a_uvmode[(bx >> ss_hor):(bx >> ss_hor) + cbw4] = b.uv_mode
            l_uvmode[cby4:cby4 + cbh4] = b.uv_mode


# ------------------------------------------------------------------
# device wavefront scan
# ------------------------------------------------------------------
def _scatter_tiles(plane, vals, pxs, pys, mask, n):
    """scatter (K, n, n) tiles at pixel positions (padded-plane coords),
    dropping masked lanes/pixels."""
    Hp, Wp = plane.shape
    d = jnp.arange(n, dtype=jnp.int32)
    ys = pys[:, None, None] + d[None, :, None] + PADT
    xs = pxs[:, None, None] + d[None, None, :] + PADT
    flat = ys * Wp + xs
    flat = jnp.where(mask, flat, -1)
    return plane.reshape(-1).at[flat.reshape(-1)].set(
        vals.reshape(-1), mode="drop").reshape(Hp, Wp)


def _sel(parts, pl):
    out = parts[0]
    for i in range(1, len(parts)):
        out = jnp.where(pl == i, parts[i], out)
    return out


def intra_scan_impl(planes, res, main_plan, filt_plan, bitdepth, ss_hor,
                    ss_ver, n_planes):
    """planes/res: tuples of padded int32 planes, ALL luma-padded shape.
    main_plan: (n_waves, K, NPARAMS); filt_plan: (n_waves, Kf, NPARAMS).
    Returns the reconstructed padded planes. Traceable (used directly
    under shard_map by parallel/tile_decode)."""
    bd_max = (1 << bitdepth) - 1
    predp = jnp.zeros_like(planes[0])  # filter-intra prediction plane

    def step(state, wave):
        planes, predp = state
        mp, fp = wave

        # ---- main units ----
        def one(p):
            pl = p[P.P_PLANE]
            bpx = p[P.P_PX] - p[P.P_OX]
            bpy = p[P.P_PY] - p[P.P_OY]

            def strip_t(plane):
                return jax.lax.dynamic_slice(
                    plane, (bpy - 1 + PADT, bpx - 1 + PADT), (1, 130))[0]

            def strip_l(plane):
                return jax.lax.dynamic_slice(
                    plane, (bpy - 1 + PADT, bpx - 1 + PADT),
                    (130, 1))[:, 0]

            ts = _sel([strip_t(planes[i]) for i in range(n_planes)], pl)
            ls = _sel([strip_l(planes[i]) for i in range(n_planes)], pl)
            own = _sel([jax.lax.dynamic_slice(
                planes[i], (p[P.P_PY] + PADT, p[P.P_PX] + PADT),
                (TILE, TILE)) for i in range(n_planes)], pl)
            luma_reg = jax.lax.dynamic_slice(
                planes[0], (p[P.P_YSRC_Y] + PADT, p[P.P_YSRC_X] + PADT),
                (64, 64))
            pred = P.pred_main_tile(ts, ls, own, luma_reg, p, bitdepth,
                                    ss_hor, ss_ver)
            rtile = _sel([jax.lax.dynamic_slice(
                res[i], (p[P.P_PY] + PADT, p[P.P_PX] + PADT),
                (TILE, TILE)) for i in range(n_planes)], pl)
            # CFL covers a whole block whose residuals are added by the
            # per-tx follow-up units (_recon_tile adds them in the tx
            # loop, not in the CFL branch) — scatter pure prediction
            rtile = jnp.where(p[P.P_MODE] == CFL_MODE, 0, rtile)
            return jnp.clip(pred + rtile, 0, bd_max)

        outs = jax.vmap(one)(mp)
        ix = jnp.arange(TILE, dtype=jnp.int32)
        inb = (ix[None, :, None] + mp[:, P.P_OY, None, None] <
               mp[:, P.P_H, None, None]) & \
              (ix[None, None, :] + mp[:, P.P_OX, None, None] <
               mp[:, P.P_W, None, None])
        valid = (mp[:, P.P_VALID] > 0)[:, None, None] & inb
        new_planes = []
        for i in range(n_planes):
            m_i = valid & (mp[:, P.P_PLANE] == i)[:, None, None]
            new_planes.append(_scatter_tiles(planes[i], outs,
                                             mp[:, P.P_PX],
                                             mp[:, P.P_PY], m_i, TILE))
        planes = tuple(new_planes)

        # ---- filter-intra cells (luma only) ----
        def onef(p):
            pred = P.pred_filter_cell(planes[0], predp, p, bitdepth)
            rtile = jax.lax.dynamic_slice(
                res[0], (p[P.P_PY] + PADT, p[P.P_PX] + PADT), (4, 4))
            return pred, jnp.clip(pred + rtile, 0, bd_max)

        fpred, fout = jax.vmap(onef)(fp)
        fvalid = jnp.broadcast_to(
            (fp[:, P.P_VALID] > 0)[:, None, None], fpred.shape)
        predp = _scatter_tiles(predp, fpred, fp[:, P.P_PX],
                               fp[:, P.P_PY], fvalid, 4)
        planes = (_scatter_tiles(planes[0], fout, fp[:, P.P_PX],
                                 fp[:, P.P_PY], fvalid, 4),) + planes[1:]
        return (planes, predp), None

    (planes, _), _ = jax.lax.scan(step, (planes, predp),
                                  (main_plan, filt_plan))
    return planes


intra_scan = jax.jit(intra_scan_impl, static_argnums=(4, 5, 6, 7))


# ------------------------------------------------------------------
# frame driver
# ------------------------------------------------------------------
def _round_up(v, m):
    return (v + m - 1) // m * m


def _emit_wave_plan(prog, arr, padn, tag):
    """Compact upload of a (nw, K, NPARAMS) wave plan. The dense plan
    is almost all padding (each wave is padded to the max-occupancy
    wave), and on the tunneled TPU it was the single largest descriptor
    slice (~10 MB/frame at 1080p). Only the real units (P_VALID == 1)
    cross the tunnel — (U, NPARAMS) int16 rows + int32 slot ids — and
    the device scatters them back into the zeros((nw, K, NPARAMS))
    layout the scan consumes. P_DC_MULT (up to 0xAAAB) is the one
    field that overflows int16; it rides in its own int32 column."""
    nw, K, NP = arr.shape
    flat = arr.reshape(nw * K, NP)
    real = np.nonzero(flat[:, P.P_VALID])[0]
    U = len(real)
    Up = padn(tag, max(U, 1))
    rows = np.zeros((Up, NP), np.int32)
    rows[:U] = flat[real]
    slots = np.full(Up, nw * K, np.int32)   # OOB -> dropped
    slots[:U] = real
    mult = rows[:, P.P_DC_MULT].copy()
    rows16 = rows
    rows16[:, P.P_DC_MULT] = 0
    assert rows16.min() >= -32768 and rows16.max() < 32768, \
        "wave-plan field out of int16 range"
    return (nw, K, prog.emit16(rows16), prog.emit(mult),
            prog.emit(slots))


def recon_intra_frame_tpu(seq, fhdr, coders, bufs):
    """Device reconstruction of an intra/key frame: batched itx residual
    planes + palette pre-placement + wavefront prediction scan. Fills
    bufs.planes in place. Caller must ensure the frame has no
    inter/intrabc blocks."""
    bitdepth = seq.bitdepth
    bd = bitdepth
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    n_planes = len(bufs.planes)
    bw, bh = coders[0].bw, coders[0].bh
    ch_w = (bw + ss_hor) >> ss_hor
    ch_h = (bh + ss_ver) >> ss_ver

    # all planes use the luma padded shape (uniform for the scan)
    Hp = bh * 4 + PADT + PAD
    Wp = bw * 4 + PADT + PAD
    plane_dims = [(bh * 4, bw * 4)] + \
        [(ch_h * 4, ch_w * 4)] * (n_planes - 1)

    # ---- palette pre-placement as 4x4-tile scatters (host; no recon
    # dependency). Tiles, not whole init planes: the old "setplane"
    # form uploaded 3 full padded int32 planes (~25 MB at 1080p) over
    # the tunnel for what is usually a handful of palette blocks. ----
    tiles = [[] for _ in range(n_planes)]
    for coder in coders:
        for b in coder.blocks:
            if not b.intra or (not b.pal_sz[0] and not b.pal_sz[1]):
                continue
            b_dim = T_BLOCK_DIM[b.bs]
            bw4, bh4 = int(b_dim[0]), int(b_dim[1])
            if b.pal_sz[0]:
                px_ = np.asarray(b.pal[0], np.int64)[b.pal_idx_y]
                py0, px0 = 4 * b.by + PADT, 4 * b.bx + PADT
                for oy in range(0, bh4 * 4, 4):
                    for ox in range(0, bw4 * 4, 4):
                        tiles[0].append((px_[oy:oy + 4, ox:ox + 4],
                                         py0 + oy, px0 + ox))
            if b.pal_sz[1] and n_planes > 1 and \
                    (bw4 > ss_hor or b.bx & 1) and \
                    (bh4 > ss_ver or b.by & 1):
                cbw4 = (bw4 + ss_hor) >> ss_hor
                cbh4 = (bh4 + ss_ver) >> ss_ver
                py0 = 4 * (b.by >> ss_ver) + PADT
                px0 = 4 * (b.bx >> ss_hor) + PADT
                for pl in (1, 2):
                    pv_ = np.asarray(b.pal[pl], np.int64)[b.pal_idx_uv]
                    for oy in range(0, cbh4 * 4, 4):
                        for ox in range(0, cbw4 * 4, 4):
                            tiles[pl].append(
                                (pv_[oy:oy + 4, ox:ox + 4],
                                 py0 + oy, px0 + ox))

    # ---- fused program: palette tiles + batched residual scatters +
    # wavefront scan + crops, packed as ONE device program (frame_exec;
    # one descriptor upload, one dispatch per frame signature) ----
    from .frame_exec import FrameProgram, run_frame_program, compact_cf
    from .tpu_inter import _p2
    from ..ops.mc_tpu import PAD_OOB

    prog = FrameProgram(n_planes, bd, [(Hp, Wp)] * n_planes,
                        out_dtype=bufs.planes[0].dtype)
    for pl in range(n_planes):
        if not tiles[pl]:
            continue
        B = len(tiles[pl])
        P_ = _p2(B)
        vals = np.zeros((P_, 4, 4), np.int32)
        ys = np.full(P_, PAD_OOB, np.int32)
        xs = np.zeros(P_, np.int32)
        for i, (v, y, x) in enumerate(tiles[pl]):
            vals[i] = v
            ys[i] = y
            xs[i] = x
        prog.op("palset", pl, prog.emit(vals), prog.emit(ys),
                prog.emit(xs))
    prog.op("newres")
    buckets = {}
    for coder in coders:
        for cb in coder.coefs:
            if cb.eob < 0:
                continue
            buckets.setdefault((cb.plane, cb.tx, cb.txtp), []).append(cb)
    for (pl, tx, txtp), lst in sorted(buckets.items()):
        sh, sw = lst[0].cf.shape
        B = len(lst)
        P = _p2(B)
        cf = np.zeros((P, sh, sw), np.int32)
        cf[:B] = np.stack([e.cf for e in lst])
        ys = np.full(P, PAD_OOB, np.int32)
        xs = np.zeros(P, np.int32)
        ys[:B] = np.fromiter((e.y * 4 + PADT for e in lst), np.int32, B)
        xs[:B] = np.fromiter((e.x * 4 + PADT for e in lst), np.int32, B)
        # sparse coefficient upload (frame_exec.compact_cf)
        vals, pos, K = compact_cf(cf)
        Kp = _p2(K)
        if Kp > K:
            vals = np.pad(vals, ((0, 0), (0, Kp - K)))
            pos = np.pad(pos, ((0, 0), (0, Kp - K)),
                         constant_values=sh * sw)
        h_vals = prog.emit16(vals) if bd == 8 else prog.emit(vals)
        prog.op("resrawc", pl, tx, txtp, sh, sw, h_vals,
                prog.emit16(pos), prog.emit(ys), prog.emit(xs))

    # ---- plan ----
    done = [np.zeros((bh, bw), np.int32),
            np.zeros((ch_h, ch_w), np.int32),
            np.zeros((ch_h, ch_w), np.int32)]
    plan = IntraPlan()
    for coder in coders:
        build_intra_plan(seq, fhdr, coder, done, plan)
    main_plan, filt_plan, n_waves = plan.finalize()
    # pad wave/K dims to buckets so jit recompiles rarely
    nw = _round_up(main_plan.shape[0], 64)
    k_m = _round_up(main_plan.shape[1], 32)
    k_f = _round_up(max(filt_plan.shape[1], 1), 8)
    mp = np.zeros((nw, k_m, NPARAMS), np.int32)
    mp[:main_plan.shape[0], :main_plan.shape[1]] = main_plan
    fpl = np.zeros((nw, k_f, NPARAMS), np.int32)
    fpl[:filt_plan.shape[0], :filt_plan.shape[1]] = filt_plan

    prog.op("intrascan",
            _emit_wave_plan(prog, mp, lambda _t, n: _p2(n), None),
            _emit_wave_plan(prog, fpl, lambda _t, n: _p2(n), None),
            ss_hor, ss_ver, n_planes)
    # crops: dev_planes[i] takes bufs.planes[i]'s shape (the contract
    # the filter chain / future ref reads expect)
    for i in range(n_planes):
        ph, pw = plane_dims[i]
        fh, fw = bufs.planes[i].shape
        prog.op("crop", i, PADT, PADT, ph, pw, fh, fw)
    prog.op("out")   # native-dtype planes: 4x smaller downloads/refs
    out, _ = run_frame_program(prog, ())
    dev = list(out)
    for i in range(n_planes):
        ph, pw = plane_dims[i]
        bufs.planes[i][:ph, :pw] = np.asarray(dev[i][:ph, :pw]).astype(
            bufs.planes[i].dtype)
    bufs.dev_planes = dev
    return bufs


def emit_mixed_intra(prog, seq, fhdr, coders, iplans, padn, cases,
                     plane_shapes):
    """Emit the wavefront intra engine's op suite into a MIXED inter
    frame's fused program (models/tpu_inter.build_frame_program):

      embed (planes -> padded layout) -> palset (palette 4x4 tiles) ->
      newres -> resrawm/resraw (intra residual planes, type-as-data) ->
      intrascan (the wave scan; inter pixels are wave 0) -> crop back.

    All inter prediction/residual ops precede this suite, so every
    pixel an intra unit's edges can read — inter (wave 0) or earlier-
    wave intra — is final when its wave executes; dav1d interleaves the
    same dependency per-block in decode order (recon_tmpl.c:1195).
    `padn`/`cases` are build_frame_program's schema-aware pad/case-union
    closures — the suite packs at grow-only sizes so the frame signature
    converges like the inter ops do."""
    from ..ops.mc_tpu import PAD_OOB
    from ..ops.itx_meta import TX_INFO, WHT_WHT

    bd = seq.bitdepth
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    n_planes = len(plane_shapes)
    bw, bh = coders[0].bw, coders[0].bh
    ch_w = (bw + ss_hor) >> ss_hor
    ch_h = (bh + ss_ver) >> ss_ver
    Hp = bh * 4 + PADT + PAD
    Wp = bw * 4 + PADT + PAD
    plane_dims = [(bh * 4, bw * 4)] + \
        [(ch_h * 4, ch_w * 4)] * (n_planes - 1)

    for pl in range(n_planes):
        ph, pw = plane_dims[pl]
        prog.op("embed", pl, Hp, Wp, ph, pw, PADT)

    # ---- palette pre-placement as 4x4 tile scatters (always emitted:
    # presence must not flip the signature between frames with and
    # without palette blocks; all-pad batches scatter-drop) ----
    tiles = [[] for _ in range(n_planes)]   # (vals(4,4), y, x)
    for coder in coders:
        for b in coder.blocks:
            if not b.intra or (not b.pal_sz[0] and not b.pal_sz[1]):
                continue
            b_dim = T_BLOCK_DIM[b.bs]
            bw4, bh4 = int(b_dim[0]), int(b_dim[1])
            if b.pal_sz[0]:
                px_ = np.asarray(b.pal[0], np.int64)[b.pal_idx_y]
                py0, px0 = 4 * b.by + PADT, 4 * b.bx + PADT
                for oy in range(0, bh4 * 4, 4):
                    for ox in range(0, bw4 * 4, 4):
                        tiles[0].append((px_[oy:oy + 4, ox:ox + 4],
                                         py0 + oy, px0 + ox))
            if b.pal_sz[1] and n_planes > 1 and \
                    (bw4 > ss_hor or b.bx & 1) and \
                    (bh4 > ss_ver or b.by & 1):
                cbw4 = (bw4 + ss_hor) >> ss_hor
                cbh4 = (bh4 + ss_ver) >> ss_ver
                py0 = 4 * (b.by >> ss_ver) + PADT
                px0 = 4 * (b.bx >> ss_hor) + PADT
                for pl in (1, 2):
                    pv_ = np.asarray(b.pal[pl], np.int64)[b.pal_idx_uv]
                    for oy in range(0, cbh4 * 4, 4):
                        for ox in range(0, cbw4 * 4, 4):
                            tiles[pl].append(
                                (pv_[oy:oy + 4, ox:ox + 4],
                                 py0 + oy, px0 + ox))
    for pl in range(n_planes):
        B = len(tiles[pl])
        P_ = padn(("palsetN", pl), B)
        vals = np.zeros((P_, 4, 4), np.int32)
        ys = np.full(P_, PAD_OOB, np.int32)
        xs = np.zeros(P_, np.int32)
        for i, (v, y, x) in enumerate(tiles[pl]):
            vals[i] = v
            ys[i] = y
            xs[i] = x
        prog.op("palset", pl, prog.emit(vals), prog.emit(ys),
                prog.emit(xs))

    prog.op("newres")

    # ---- intra residual planes: type-as-data buckets at +PADT ----
    def _dummy(key):
        return []

    from .frame_exec import compact_cf

    for (pl, tx, is_wht), lst in cases(("resrawm",), iplans, _dummy):
        w_t, h_t, _ = TX_INFO[tx]
        sh, sw = min(h_t, 32), min(w_t, 32)
        B = len(lst)
        P_ = padn(("resrawmN", pl, tx, is_wht), B)
        cf = np.zeros((P_, sh, sw), np.int32)
        ys = np.full(P_, PAD_OOB, np.int32)
        xs = np.zeros(P_, np.int32)
        sel = np.zeros((P_, 2), np.int32)
        if B:
            cf[:B] = lst.cf
            ys[:B] = lst.ys + PADT
            xs[:B] = lst.xs + PADT
            sel[:B] = lst.sel
        # sparse coefficient upload (frame_exec.compact_cf): only the
        # nonzeros cross the tunnel; K schema-padded for stability
        vals, pos, K = compact_cf(cf)
        Kp = padn(("resrawmK", pl, tx, is_wht), K)
        if Kp > K:
            vals = np.pad(vals, ((0, 0), (0, Kp - K)))
            pos = np.pad(pos, ((0, 0), (0, Kp - K)),
                         constant_values=sh * sw)
        h_vals = prog.emit16(vals) if bd == 8 else prog.emit(vals)
        h_pos = prog.emit16(pos)
        if is_wht:
            prog.op("resrawc", pl, tx, WHT_WHT, sh, sw, h_vals, h_pos,
                    prog.emit(ys), prog.emit(xs))
        else:
            prog.op("resrawmc", pl, sh, sw, tx, h_vals, h_pos,
                    prog.emit(sel[:, 0]), prog.emit(sel[:, 1]),
                    prog.emit(ys), prog.emit(xs))

    # ---- wave plan ----
    done = [np.zeros((bh, bw), np.int32),
            np.zeros((ch_h, ch_w), np.int32),
            np.zeros((ch_h, ch_w), np.int32)]
    plan = IntraPlan()
    for coder in coders:
        build_intra_plan(seq, fhdr, coder, done, plan)
    main_plan, filt_plan, n_waves = plan.finalize()
    nw = padn(("iscan", "nw"), main_plan.shape[0])
    k_m = padn(("iscan", "km"), main_plan.shape[1])
    k_f = padn(("iscan", "kf"), max(filt_plan.shape[1], 1))
    mp = np.zeros((nw, k_m, NPARAMS), np.int32)
    mp[:main_plan.shape[0], :main_plan.shape[1]] = main_plan
    fpl = np.zeros((nw, k_f, NPARAMS), np.int32)
    fpl[:filt_plan.shape[0], :filt_plan.shape[1]] = filt_plan
    prog.op("intrascan",
            _emit_wave_plan(prog, mp, padn, ("iscanU", "m")),
            _emit_wave_plan(prog, fpl, padn, ("iscanU", "f")),
            ss_hor, ss_ver, n_planes)

    for pl in range(n_planes):
        ph, pw = plane_dims[pl]
        fh, fw = plane_shapes[pl]
        prog.op("crop", pl, PADT, PADT, ph, pw, fh, fw)
