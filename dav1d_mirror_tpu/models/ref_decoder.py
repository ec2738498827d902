"""NumPy reference frame reconstruction (the behavioral spec for the TPU
pipeline) + full IVF->YUV decode driver for intra frames.

Mirrors dav1d's 2-pass structure: the TileCoder's entropy output (blocks +
dequantized coefficient blocks in decode order) is replayed block by block:
intra prediction from reconstructed neighbours, inverse transform + add.
Reference parity: dav1d src/recon_tmpl.c dav1d_recon_b_intra:1195.
"""
from __future__ import annotations

from ..errors import DecodeError

import numpy as np

from ..host import headers as h
from ..host import obu as obu_mod
from ..host.ivf import parse_ivf, split_obus
from ..host.msac import Msac
from ..host.tilecoder import (TileCoder, DecodeSide, T_BLOCK_DIM, T_TXFM,
                              CFL_PRED, FILTER_PRED, COMP_INTER_NONE,
                              COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG,
                              COMP_INTER_SEG, COMP_INTER_WEDGE,
                              MM_TRANSLATION, GLOBALMV)
from ..data.tables import new_cdf_context, qcat_from_qidx, cdf_thread_update
from ..ops.ref import ipred as ip
from ..ops.ref import mc as mcdsp
from ..ops.ref.ipred_prepare import prepare_intra_edges
from ..ops.ref.itx import inv_txfm_add_ref

SMOOTH_MODES = (9, 10, 11)  # SMOOTH, SMOOTH_V, SMOOTH_H (coded enum)
ANGLE_SMOOTH_EDGE_FLAG = 512


class FrameBuffers:
    def __init__(self, seq: h.SequenceHeader, fhdr: h.FrameHeader,
                 width=None):
        self.seq = seq
        self.fhdr = fhdr
        self.bitdepth = seq.bitdepth
        dt = np.uint8 if self.bitdepth == 8 else np.uint16
        self.ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
        self.ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
        w, hgt = width if width is not None else fhdr.width[0], fhdr.height
        aw = (w + 127) & ~127
        ah = (hgt + 127) & ~127
        self.width, self.height = w, hgt
        # device-resident copies of the (padded) planes, populated by
        # the TPU pixel path so reference frames never re-upload over
        # the (slow) host<->device link; None on the host path
        self.dev_planes = None
        self.planes = [np.zeros((ah, aw), dt)]
        if seq.layout != h.PIXEL_LAYOUT_I400:
            cw = aw >> self.ss_hor
            ch = ah >> self.ss_ver
            self.planes += [np.zeros((ch, cw), dt), np.zeros((ch, cw), dt)]

    def visible(self):
        w, hgt = self.width, self.height
        out = [self.planes[0][:hgt, :w]]
        if len(self.planes) > 1:
            cw = (w + self.ss_hor) >> self.ss_hor
            ch = (hgt + self.ss_ver) >> self.ss_ver
            out += [p[:ch, :cw] for p in self.planes[1:]]
        return out


def recon_frame(seq, fhdr, coders, bufs: FrameBuffers, refs=None,
                jnt_weights=None):
    """coders: list of completed (entropy-decoded) TileCoders.
    refs: 8-slot list of reference FrameBuffers (inter frames)."""
    residuals = _batch_residuals(seq, coders)
    for coder in coders:
        _recon_tile(seq, fhdr, coder, bufs, refs, jnt_weights,
                    residuals=residuals)
    return bufs


def _batch_residuals(seq, coders):
    """Inverse-transform all coded blocks in (tx, type) batches (the
    host twin of the device residual pass — same butterflies, ~100x
    fewer Python calls than per-block itx). Returns the (plane, y, x)
    residual map consumed by _itx_add_block."""
    from ..ops.itx import itx_residual_np

    plans = {}
    for coder in coders:
        for cb in coder.coefs:
            if cb.eob < 0:
                continue
            plans.setdefault((cb.plane, cb.tx, cb.txtp), []).append(cb)
    out = {}
    for (pl, tx, txtp), lst in plans.items():
        cfs = np.stack([cb.cf for cb in lst])
        res = itx_residual_np(cfs, tx, txtp, seq.bitdepth)
        for i, cb in enumerate(lst):
            out[(pl, cb.y, cb.x)] = res[i]
    return out


# backwards-compatible alias (intra-only callers)
recon_intra_frame = recon_frame


def _itx_add_block(plane, cb, tx, bitdepth, residuals):
    """Inverse-transform-add for one coefficient block. If the device
    pass precomputed this block's residual (models/tpu_inter: batched
    ops/itx.itx_residual keyed by (plane, y, x)), just add + clip —
    bit-identical to the reference itx add (recon_tmpl.c:97-99)."""
    t_dim = T_TXFM[tx]
    tw, th = int(t_dim[0]) * 4, int(t_dim[1]) * 4
    py, px = cb.y * 4, cb.x * 4
    patch = plane[py:py + th, px:px + tw]
    res = residuals.get((cb.plane, cb.y, cb.x)) \
        if residuals is not None else None
    if res is not None:
        plane[py:py + th, px:px + tw] = np.clip(
            patch.astype(np.int32) + res, 0,
            (1 << bitdepth) - 1).astype(plane.dtype)
    else:
        plane[py:py + th, px:px + tw] = inv_txfm_add_ref(
            patch, cb.cf, cb.eob, tx, cb.txtp, bitdepth)


def _mc_put(refplane, ref_w, ref_h, bw4, bh4, bx, by, ss_hor, ss_ver, mv,
            filter2d, bd):
    """Translational MC with edge emulation (dav1d recon_tmpl.c mc:957).

    refplane: padded ref plane array; ref_w/ref_h: visible LUMA dims;
    bx/by in (luma-scaled) 4px block units; mv in 1/8 luma px."""
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    mvy, mvx = mv
    mx = mvx & (15 >> (0 if ss_hor else 1))
    my = mvy & (15 >> (0 if ss_ver else 1))
    dx = bx * h_mul + (mvx >> (3 + ss_hor))
    dy = by * v_mul + (mvy >> (3 + ss_ver))
    w = (ref_w + ss_hor) >> ss_hor
    h = (ref_h + ss_ver) >> ss_ver
    bw_px, bh_px = bw4 * h_mul, bh4 * v_mul
    src = mcdsp.emu_edge(bw_px + 7, bh_px + 7, w, h, dx - 3, dy - 3,
                         refplane[:h, :w])
    if filter2d == mcdsp.FILTER_2D_BILINEAR:
        return mcdsp.put_bilin(src[3:, 3:], bw_px, bh_px,
                               mx << (0 if ss_hor else 1),
                               my << (0 if ss_ver else 1), bd)
    return mcdsp.put_8tap(src, bw_px, bh_px, mx << (0 if ss_hor else 1),
                          my << (0 if ss_ver else 1), filter2d, bd)


def _mc_prep(refplane, ref_w, ref_h, bw4, bh4, bx, by, ss_hor, ss_ver, mv,
             filter2d, bd):
    """Compound-path MC producing int16-domain "tmp" (dav1d mct)."""
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    mvy, mvx = mv
    mx = mvx & (15 >> (0 if ss_hor else 1))
    my = mvy & (15 >> (0 if ss_ver else 1))
    dx = bx * h_mul + (mvx >> (3 + ss_hor))
    dy = by * v_mul + (mvy >> (3 + ss_ver))
    w = (ref_w + ss_hor) >> ss_hor
    h = (ref_h + ss_ver) >> ss_ver
    bw_px, bh_px = bw4 * h_mul, bh4 * v_mul
    src = mcdsp.emu_edge(bw_px + 7, bh_px + 7, w, h, dx - 3, dy - 3,
                         refplane[:h, :w])
    return mcdsp.prep_8tap(src, bw_px, bh_px, mx << (0 if ss_hor else 1),
                           my << (0 if ss_ver else 1), filter2d, bd)


def _scale_fac(ref_sz, this_sz):
    return ((ref_sz << 14) + (this_sz >> 1)) // this_sz


def _scale_mv(val, scale):
    """dav1d recon_tmpl.c mc scale_mv macro:1015."""
    tmp = val * scale + (scale - 0x4000) * 8
    v = (abs(tmp) + 128) >> 8
    return (-v if tmp < 0 else v) + 32


def _mc_scaled(refplane, ref_w, ref_h, bw4, bh4, bx, by, ss_hor, ss_ver,
               mv, filter2d, bd, scale, step, prep):
    """Scaled-reference MC (dav1d recon_tmpl.c mc:1010-1065)."""
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    mvy, mvx = mv
    orig_x = (bx * h_mul << 4) + mvx * (1 << (0 if ss_hor else 1))
    orig_y = (by * v_mul << 4) + mvy * (1 << (0 if ss_ver else 1))
    pos_x = _scale_mv(orig_x, scale[0])
    pos_y = _scale_mv(orig_y, scale[1])
    left, top = pos_x >> 10, pos_y >> 10
    bw_px, bh_px = bw4 * h_mul, bh4 * v_mul
    right = ((pos_x + (bw_px - 1) * step[0]) >> 10) + 1
    bottom = ((pos_y + (bh_px - 1) * step[1]) >> 10) + 1
    w = (ref_w + ss_hor) >> ss_hor
    h = (ref_h + ss_ver) >> ss_ver
    src = mcdsp.emu_edge(right - left + 7, bottom - top + 7, w, h,
                         left - 3, top - 3, refplane[:h, :w])
    fn = mcdsp.prep_8tap_scaled if prep else mcdsp.put_8tap_scaled
    return fn(src, bw_px, bh_px, pos_x & 0x3FF, pos_y & 0x3FF,
              step[0], step[1], filter2d, bd)


def _warp_affine(refplane, ref_w, ref_h, bw4, bh4, bx, by, ss_hor, ss_ver,
                 wm, bd, prep=False):
    """Affine warp over 8x8 sub-blocks (dav1d recon_tmpl.c
    warp_affine:1134)."""
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    assert not ((bw4 * h_mul) & 7) and not ((bh4 * v_mul) & 7)
    mat = wm.matrix
    width = (ref_w + ss_hor) >> ss_hor
    height = (ref_h + ss_ver) >> ss_ver
    abcd = (wm.alpha, wm.beta, wm.gamma, wm.delta)
    out = np.zeros((bh4 * v_mul, bw4 * h_mul), np.int32)
    for y in range(0, bh4 * v_mul, 8):
        src_y = by * 4 + ((y + 4) << ss_ver)
        mat3_y = mat[3] * src_y + mat[0]
        mat5_y = mat[5] * src_y + mat[1]
        for x in range(0, bw4 * h_mul, 8):
            src_x = bx * 4 + ((x + 4) << ss_hor)
            mvx = (mat[2] * src_x + mat3_y) >> ss_hor
            mvy = (mat[4] * src_x + mat5_y) >> ss_ver
            dx = (mvx >> 16) - 4
            mx = ((mvx & 0xFFFF) - wm.alpha * 4 - wm.beta * 7) & ~0x3F
            dy = (mvy >> 16) - 4
            my = ((mvy & 0xFFFF) - wm.gamma * 4 - wm.delta * 4) & ~0x3F
            src = mcdsp.emu_edge(15, 15, width, height, dx - 3, dy - 3,
                                 refplane[:height, :width])
            blk = mcdsp.warp8x8t(src, abcd, mx, my, bd) if prep else \
                mcdsp.warp8x8(src, abcd, mx, my, bd)
            out[y:y + 8, x:x + 8] = blk
    return out


def _obmc(seq, fhdr, coder, bufs, refs, b, state, pl, ss_hor, ss_ver,
          dst_y, dst_x):
    """Overlapped block MC (dav1d recon_tmpl.c obmc:1071). dst_y/dst_x:
    top-left of this block in the plane (pixels)."""
    bd = seq.bitdepth
    rf = coder.rf
    f2d = state["f2d_map"]
    b_dim = T_BLOCK_DIM[b.bs]
    bw4, bh4 = int(b_dim[0]), int(b_dim[1])
    bx, by = b.bx, b.by
    w4 = min(bw4, coder.bw - bx)
    h4 = min(bh4, coder.bh - by)
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    cur_w, cur_h = fhdr.width[0], fhdr.height
    plane = bufs.planes[pl]

    if by > coder.row_start and (pl == 0 or
                                 bw4 * h_mul + bh4 * v_mul >= 16):
        i = 0
        x = 0
        while x < w4 and i < min(int(b_dim[2]), 4):
            # only odd blocks are considered for overlap handling, hence +1
            cy, cx = by - 1, bx + x + 1
            step4 = max(2, min(16, int(T_BLOCK_DIM[rf.bs[cy, cx]][0])))
            if rf.ref[cy, cx, 0] > 0:
                ow4 = min(step4, bw4)
                oh4 = min(bh4, 16) >> 1
                rb = refs[fhdr.refidx[int(rf.ref[cy, cx, 0]) - 1]]
                rmv = (int(rf.mv[cy, cx, 0, 0]), int(rf.mv[cy, cx, 0, 1]))
                lap = _mc_any(rb, pl, cur_w, cur_h, ow4,
                              (oh4 * 3 + 3) >> 2, bx + x, by,
                              ss_hor, ss_ver, rmv, int(f2d[cy, cx]), bd)
                region = plane[dst_y:dst_y + v_mul * oh4,
                               dst_x + x * h_mul:
                               dst_x + x * h_mul + h_mul * ow4]
                plane[dst_y:dst_y + v_mul * oh4,
                      dst_x + x * h_mul:dst_x + x * h_mul + h_mul * ow4] = \
                    mcdsp.blend_h(region, lap, h_mul * ow4, v_mul * oh4)
                i += 1
            x += step4

    if bx > coder.col_start:
        i = 0
        y = 0
        while y < h4 and i < min(int(b_dim[3]), 4):
            cy, cx = by + y + 1, bx - 1
            step4 = max(2, min(16, int(T_BLOCK_DIM[rf.bs[cy, cx]][1])))
            if rf.ref[cy, cx, 0] > 0:
                ow4 = min(bw4, 16) >> 1
                oh4 = min(step4, bh4)
                rb = refs[fhdr.refidx[int(rf.ref[cy, cx, 0]) - 1]]
                rmv = (int(rf.mv[cy, cx, 0, 0]), int(rf.mv[cy, cx, 0, 1]))
                lap = _mc_any(rb, pl, cur_w, cur_h, ow4, oh4,
                              bx, by + y, ss_hor, ss_ver, rmv,
                              int(f2d[cy, cx]), bd)
                region = plane[dst_y + y * v_mul:
                               dst_y + y * v_mul + v_mul * oh4,
                               dst_x:dst_x + h_mul * ow4]
                plane[dst_y + y * v_mul:dst_y + y * v_mul + v_mul * oh4,
                      dst_x:dst_x + h_mul * ow4] = \
                    mcdsp.blend_v(region, lap, h_mul * ow4, v_mul * oh4)
                i += 1
            y += step4


_GMV_WARP_CACHE = {}


def _gmv_warp_params(fhdr, ref_i, scaled):
    """dav1d decode.c:3528-3531 gmv_warp_allowed + shear computation.
    Returns a WarpParams or None if warp is not allowed for this gmv."""
    from ..host.warpmv import WarpParams, get_shear_params
    key = (id(fhdr), ref_i, scaled)
    if key in _GMV_WARP_CACHE:
        return _GMV_WARP_CACHE[key]
    g = fhdr.gmv[ref_i]
    out = None
    if g.type > 1 and not fhdr.force_integer_mv and not scaled:
        wm = WarpParams()
        wm.matrix = list(g.matrix)
        if not get_shear_params(wm):
            wm.type = g.type
            out = wm
    _GMV_WARP_CACHE[key] = out
    if len(_GMV_WARP_CACHE) > 256:
        _GMV_WARP_CACHE.clear()
    return out


def _mc_any(rb, pl, cur_w, cur_h, bw4, bh4, bx, by, ssh, ssv, mv, f2d, bd,
            prep=False):
    """Dispatch to same-size or scaled-reference MC (dav1d mc:974)."""
    if rb.width == cur_w and rb.height == cur_h:
        fn = _mc_prep if prep else _mc_put
        return fn(rb.planes[pl], cur_w, cur_h, bw4, bh4, bx, by, ssh, ssv,
                  mv, f2d, bd)
    sx = _scale_fac(rb.width, cur_w)
    sy = _scale_fac(rb.height, cur_h)
    return _mc_scaled(rb.planes[pl], rb.width, rb.height, bw4, bh4, bx, by,
                      ssh, ssv, mv, f2d, bd, (sx, sy),
                      ((sx + 8) >> 4, (sy + 8) >> 4), prep)


def _recon_b_inter(seq, fhdr, coder, bufs, refs, b, state):
    """Inter block reconstruction (dav1d recon_tmpl.c
    dav1d_recon_b_inter:1598). state: dict with 'tl_4x4_filter' and
    'f2d_map' (per-4x4 filter2d splatted over each inter block extent)."""
    bd = seq.bitdepth
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    b_dim = T_BLOCK_DIM[b.bs]
    bw4, bh4 = int(b_dim[0]), int(b_dim[1])
    bx, by = b.bx, b.by
    has_chroma = (len(bufs.planes) > 1 and
                  (bw4 > ss_hor or bx & 1) and (bh4 > ss_ver or by & 1))
    cur_w, cur_h = fhdr.width[0], fhdr.height
    yplane = bufs.planes[0]

    def refbufs(ri):
        rb = refs[fhdr.refidx[ri]]
        if rb is None:
            raise DecodeError("missing reference frame")
        return rb

    if fhdr.frame_type in (0, 2):
        # intra block copy from the current frame (recon_tmpl.c:1624-1636);
        # bounds are the padded 4x4-aligned frame dims
        w_pad, h_pad = coder.bw * 4, coder.bh * 4
        pred = _mc_put(yplane, w_pad, h_pad, bw4, bh4, bx, by, 0, 0,
                       b.mv[0], 9, bd)
        yplane[by * 4:by * 4 + bh4 * 4, bx * 4:bx * 4 + bw4 * 4] = pred
        if has_chroma:
            uvx, uvy = (bx >> ss_hor) * 4, (by >> ss_ver) * 4
            cw = (bw4 << (bw4 == ss_hor)) * 4 >> ss_hor
            ch = (bh4 << (bh4 == ss_ver)) * 4 >> ss_ver
            for pl in (1, 2):
                p = _mc_put(bufs.planes[pl], w_pad, h_pad,
                            bw4 << (bw4 == ss_hor), bh4 << (bh4 == ss_ver),
                            bx & ~ss_hor, by & ~ss_ver, ss_hor, ss_ver,
                            b.mv[0], 9, bd)
                bufs.planes[pl][uvy:uvy + ch, uvx:uvx + cw] = p
    elif b.comp_type == COMP_INTER_NONE:
        refp = refbufs(b.ref[0])
        scaled = refp.width != cur_w or refp.height != cur_h
        warp_wm = None
        if min(bw4, bh4) > 1:
            if b.motion_mode == 2 and b.warp is not None and \
                    b.warp.type > 1:
                warp_wm = b.warp
            elif b.inter_mode == GLOBALMV:
                warp_wm = _gmv_warp_params(fhdr, b.ref[0], scaled)
        use_warp = warp_wm is not None
        if use_warp:
            pred = _warp_affine(refp.planes[0], cur_w, cur_h, bw4, bh4,
                                bx, by, 0, 0, warp_wm, bd)
        else:
            pred = _mc_any(refp, 0, cur_w, cur_h, bw4, bh4, bx, by,
                           0, 0, b.mv[0], b.filter2d, bd)
        yplane[by * 4:by * 4 + bh4 * 4, bx * 4:bx * 4 + bw4 * 4] = pred
        if not use_warp and b.motion_mode == 1:  # MM_OBMC
            _obmc(seq, fhdr, coder, bufs, refs, b, state, 0, 0, 0,
                  by * 4, bx * 4)
        if b.interintra_type:
            # dav1d recon_tmpl.c:1658-1681
            from ..ops.ref.wedge import ii_mask
            m = 9 if b.interintra_mode == 3 else b.interintra_mode  # SMOOTH
            m2, _, tl, cols = prepare_intra_edges(
                bx, bx > coder.col_start, by, by > coder.row_start,
                coder.col_end, coder.row_end, 0, yplane, bx * 4, by * 4,
                m, 0, bw4, bh4, 0, bd)
            ipred = ip.intra_pred_ref(m2, tl, cols, bw4 * 4, bh4 * 4, 0,
                                      0, 0, bd)
            msk = ii_mask(0, b.bs, b.interintra_type, b.interintra_mode,
                          b.wedge_idx)[:bh4 * 4, :bw4 * 4]
            region = yplane[by * 4:by * 4 + bh4 * 4,
                            bx * 4:bx * 4 + bw4 * 4]
            yplane[by * 4:by * 4 + bh4 * 4, bx * 4:bx * 4 + bw4 * 4] = \
                mcdsp.blend(region, ipred, msk)

        if has_chroma:
            rf = coder.rf
            f2d = state["f2d_map"]
            uvx, uvy = (bx >> ss_hor) * 4, (by >> ss_ver) * 4
            is_sub8x8 = bw4 == ss_hor or bh4 == ss_ver
            if is_sub8x8:
                assert ss_hor == 1
                if bw4 == 1:
                    is_sub8x8 &= rf.ref[by, bx - 1, 0] > 0
                if bh4 == ss_ver:
                    is_sub8x8 &= rf.ref[by - 1, bx, 0] > 0
                if bw4 == 1 and bh4 == ss_ver:
                    is_sub8x8 &= rf.ref[by - 1, bx - 1, 0] > 0
            if is_sub8x8:
                h_off = v_off = 0
                cw, ch = bw4 * 4 >> ss_hor, bh4 * 4 >> ss_ver

                def sub_mc(cy, cx, dst_yoff, dst_xoff, f2d_val):
                    rref = int(rf.ref[cy, cx, 0]) - 1
                    rmv = (int(rf.mv[cy, cx, 0, 0]), int(rf.mv[cy, cx, 0, 1]))
                    rb = refbufs(rref)
                    for pl in (1, 2):
                        p = _mc_any(rb, pl, cur_w, cur_h, bw4, bh4,
                                    cx, cy, ss_hor, ss_ver, rmv, f2d_val, bd)
                        bufs.planes[pl][uvy + dst_yoff:uvy + dst_yoff + ch,
                                        uvx + dst_xoff:uvx + dst_xoff + cw] \
                            = p

                if bw4 == 1 and bh4 == ss_ver:
                    sub_mc(by - 1, bx - 1, 0, 0, state["tl_4x4_filter"])
                    v_off, h_off = 2, 2
                if bw4 == 1:
                    sub_mc(by, bx - 1, v_off, 0, int(f2d[by, bx - 1]))
                    h_off = 2
                if bh4 == ss_ver:
                    sub_mc(by - 1, bx, 0, h_off, int(f2d[by - 1, bx]))
                    v_off = 2
                for pl in (1, 2):
                    p = _mc_any(refp, pl, cur_w, cur_h, bw4, bh4,
                                bx, by, ss_hor, ss_ver, b.mv[0], b.filter2d,
                                bd)
                    bufs.planes[pl][uvy + v_off:uvy + v_off + ch,
                                    uvx + h_off:uvx + h_off + cw] = p
            else:
                cbw4 = (bw4 + ss_hor) >> ss_hor
                cbh4 = (bh4 + ss_ver) >> ss_ver
                cw = (bw4 << (bw4 == ss_hor)) * 4 >> ss_hor
                ch = (bh4 << (bh4 == ss_ver)) * 4 >> ss_ver
                if use_warp and min(cbw4, cbh4) > 1:
                    for pl in (1, 2):
                        p = _warp_affine(refp.planes[pl], cur_w, cur_h,
                                         bw4, bh4, bx, by, ss_hor, ss_ver,
                                         warp_wm, bd)
                        bufs.planes[pl][uvy:uvy + ch, uvx:uvx + cw] = p
                else:
                    for pl in (1, 2):
                        p = _mc_any(refp, pl, cur_w, cur_h,
                                    bw4 << (bw4 == ss_hor),
                                    bh4 << (bh4 == ss_ver),
                                    bx & ~ss_hor, by & ~ss_ver,
                                    ss_hor, ss_ver, b.mv[0], b.filter2d, bd)
                        bufs.planes[pl][uvy:uvy + ch, uvx:uvx + cw] = p
                        if b.motion_mode == 1:  # MM_OBMC
                            _obmc(seq, fhdr, coder, bufs, refs, b, state,
                                  pl, ss_hor, ss_ver, uvy, uvx)
                if b.interintra_type:
                    # dav1d recon_tmpl.c:1779-1817
                    from ..ops.ref.wedge import ii_mask
                    chr_idx = ss_hor + ss_ver
                    msk = ii_mask(chr_idx, b.bs, b.interintra_type,
                                  b.interintra_mode,
                                  b.wedge_idx)[:cbh4 * 4, :cbw4 * 4]
                    m = 9 if b.interintra_mode == 3 else b.interintra_mode
                    for pl in (1, 2):
                        plane = bufs.planes[pl]
                        xpos, ypos = bx >> ss_hor, by >> ss_ver
                        m2, _, tl, cols = prepare_intra_edges(
                            xpos, xpos > (coder.col_start >> ss_hor),
                            ypos, ypos > (coder.row_start >> ss_ver),
                            coder.col_end >> ss_hor,
                            coder.row_end >> ss_ver, 0, plane,
                            xpos * 4, ypos * 4, m, 0, cbw4, cbh4, 0, bd)
                        ipred = ip.intra_pred_ref(m2, tl, cols, cbw4 * 4,
                                                  cbh4 * 4, 0, 0, 0, bd)
                        region = plane[uvy:uvy + cbh4 * 4,
                                       uvx:uvx + cbw4 * 4]
                        plane[uvy:uvy + cbh4 * 4, uvx:uvx + cbw4 * 4] = \
                            mcdsp.blend(region, ipred, msk)
        state["tl_4x4_filter"] = b.filter2d
    else:
        # compound (dav1d recon_tmpl.c:1822-1907)
        def comp_gmv_warp(i):
            rb = refbufs(b.ref[i])
            scaled = rb.width != cur_w or rb.height != cur_h
            return _gmv_warp_params(fhdr, b.ref[i], scaled) \
                if b.inter_mode == 6 else None

        tmp = []
        for i in range(2):
            rb = refbufs(b.ref[i])
            wm = comp_gmv_warp(i)
            if wm is not None:
                tmp.append(_warp_affine(rb.planes[0], cur_w, cur_h,
                                        bw4, bh4, bx, by, 0, 0, wm, bd,
                                        prep=True))
            else:
                tmp.append(_mc_any(rb, 0, cur_w, cur_h, bw4, bh4,
                                   bx, by, 0, 0, b.mv[i], b.filter2d, bd,
                                   prep=True))
        mask_arr = None
        jnt_weight = 0
        if b.comp_type == COMP_INTER_AVG:
            pred = mcdsp.avg(tmp[0], tmp[1], bd)
        elif b.comp_type == COMP_INTER_WEIGHTED_AVG:
            jnt_weight = state["jnt_weights"][b.ref[0]][b.ref[1]]
            pred = mcdsp.w_avg(tmp[0], tmp[1], jnt_weight, bd)
        elif b.comp_type == COMP_INTER_SEG:
            pred, mask_arr = mcdsp.w_mask(
                tmp[b.mask_sign], tmp[1 - b.mask_sign],
                bw4 * 4, bh4 * 4, b.mask_sign, ss_hor, ss_ver, bd)
        else:  # COMP_INTER_WEDGE
            from ..ops.ref.wedge import wedge_mask
            pred = mcdsp.mask(tmp[b.mask_sign], tmp[1 - b.mask_sign],
                              wedge_mask(0, b.bs, 0, b.wedge_idx), bd)
            if has_chroma:
                mask_arr = wedge_mask(ss_hor + ss_ver, b.bs, b.mask_sign,
                                      b.wedge_idx)
        yplane[by * 4:by * 4 + bh4 * 4, bx * 4:bx * 4 + bw4 * 4] = pred
        if has_chroma:
            uvx, uvy = (bx >> ss_hor) * 4, (by >> ss_ver) * 4
            cw, ch = bw4 * 4 >> ss_hor, bh4 * 4 >> ss_ver
            for pl in (1, 2):
                ctmp = []
                for i in range(2):
                    rb = refbufs(b.ref[i])
                    wm = comp_gmv_warp(i)
                    cbw4c = (bw4 + ss_hor) >> ss_hor
                    cbh4c = (bh4 + ss_ver) >> ss_ver
                    if wm is not None and min(cbw4c, cbh4c) > 1:
                        ctmp.append(_warp_affine(rb.planes[pl], cur_w,
                                                 cur_h, bw4, bh4, bx, by,
                                                 ss_hor, ss_ver, wm, bd,
                                                 prep=True))
                    else:
                        ctmp.append(_mc_any(rb, pl, cur_w, cur_h,
                                            bw4, bh4, bx, by, ss_hor,
                                            ss_ver, b.mv[i], b.filter2d,
                                            bd, prep=True))
                if b.comp_type == COMP_INTER_AVG:
                    cpred = mcdsp.avg(ctmp[0], ctmp[1], bd)
                elif b.comp_type == COMP_INTER_WEIGHTED_AVG:
                    cpred = mcdsp.w_avg(ctmp[0], ctmp[1], jnt_weight, bd)
                else:
                    cpred = mcdsp.mask(ctmp[b.mask_sign],
                                       ctmp[1 - b.mask_sign], mask_arr, bd)
                bufs.planes[pl][uvy:uvy + ch, uvx:uvx + cw] = cpred

    if fhdr.frame_type not in (0, 2):
        # per-4x4 filter2d map (dav1d ctx filter splat), read by later
        # sub8x8 chroma and OBMC neighbours
        state["f2d_map"][by:by + bh4, bx:bx + bw4] = b.filter2d

    # residuals: replay this block's coefficient blocks (any order is valid
    # for inter since prediction does not depend on reconstructed pixels)
    if not b.skip:
        bitdepth = seq.bitdepth
        for cb in coder.coefs[b.coef_lo:b.coef_hi]:
            if cb.eob < 0:
                continue
            _itx_add_block(bufs.planes[cb.plane], cb, cb.tx, bitdepth,
                           state.get("residuals"))


def _recon_tile(seq, fhdr, coder, bufs, refs=None, jnt_weights=None,
                device_done=None, residuals=None):
    bitdepth = seq.bitdepth
    bd_max = (1 << bitdepth) - 1
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    bw, bh = coder.bw, coder.bh
    sb_step = coder.sb_step
    ief = seq.intra_edge_filter
    ief_flag = ief << 10
    monochrome = seq.layout == h.PIXEL_LAYOUT_I400
    keyframe = fhdr.frame_type in (0, 2)

    # recon-time neighbour mode state (for smoothness flags)
    a_mode = np.zeros(bw + 32, np.uint8)
    a_intra = np.full(bw + 32, 1 if keyframe else 0, np.uint8)
    a_uvmode = np.zeros(bw + 32, np.uint8)
    l_mode = np.zeros(32, np.uint8)
    l_intra = np.full(32, 1 if keyframe else 0, np.uint8)
    l_uvmode = np.zeros(32, np.uint8)
    cur_sbrow = [-1]

    # inter recon state (dav1d t->tl_4x4_filter + frame-thread filter map)
    inter_state = {"tl_4x4_filter": 0,
                   "f2d_map": np.zeros((bh, bw), np.uint8),
                   "jnt_weights": jnt_weights,
                   "residuals": residuals}

    def sm_flag(mode_arr, intra_arr, idx):
        if not intra_arr[idx]:
            return 0
        return ANGLE_SMOOTH_EDGE_FLAG if mode_arr[idx] in SMOOTH_MODES else 0

    def sm_uv_flag(uvmode_arr, idx):
        return ANGLE_SMOOTH_EDGE_FLAG if uvmode_arr[idx] in SMOOTH_MODES \
            else 0

    for bi, b in enumerate(coder.blocks):
        sbrow = b.by // sb_step
        if sbrow != cur_sbrow[0]:
            cur_sbrow[0] = sbrow
            l_mode[:] = 0
            l_intra[:] = 1 if keyframe else 0
            l_uvmode[:] = 0

        if not b.intra:
            if device_done is not None and bi in device_done:
                # pixels already produced by the batched device path;
                # still maintain recon-side state for later blocks
                if b.comp_type == COMP_INTER_NONE:
                    inter_state["tl_4x4_filter"] = b.filter2d
                b_dim_i = T_BLOCK_DIM[b.bs]
                inter_state["f2d_map"][b.by:b.by + int(b_dim_i[1]),
                                       b.bx:b.bx + int(b_dim_i[0])] = \
                    b.filter2d
            else:
                _recon_b_inter(seq, fhdr, coder, bufs, refs, b,
                               inter_state)
            b_dim_i = T_BLOCK_DIM[b.bs]
            bw4_i, bh4_i = int(b_dim_i[0]), int(b_dim_i[1])
            by4_i = b.by & 31
            a_intra[b.bx:b.bx + bw4_i] = 0
            l_intra[by4_i:by4_i + bh4_i] = 0
            if len(bufs.planes) > 1:
                cbw4_i = (bw4_i + ss_hor) >> ss_hor
                cbh4_i = (bh4_i + ss_ver) >> ss_ver
                has_chroma_i = ((bw4_i > ss_hor or b.bx & 1) and
                                (bh4_i > ss_ver or b.by & 1))
                if has_chroma_i:
                    a_uvmode[(b.bx >> ss_hor):(b.bx >> ss_hor) + cbw4_i] = 0
                    cby4_i = by4_i >> ss_ver
                    l_uvmode[cby4_i:cby4_i + cbh4_i] = 0
            continue

        coef_iter = iter(coder.coefs[b.coef_lo:b.coef_hi])

        b_dim = T_BLOCK_DIM[b.bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx, by = b.bx, b.by
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> ss_hor, by4 >> ss_ver
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
        yplane = bufs.planes[0]

        for init_y in range(0, h4, 16):
            sub_h4 = min(h4, 16 + init_y)
            sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
            for init_x in range(0, w4, 16):
                sub_w4 = min(w4, init_x + 16)
                intra_flags = (sm_flag(a_mode, a_intra, bx + init_x) |
                               sm_flag(l_mode, l_intra, by4 + init_y) |
                               ief_flag)
                sb_has_tr = 1 if init_x + 16 < w4 else 0 if init_y else \
                    (b.edge_flags & 1)  # EDGE_I444_TOP_HAS_RIGHT
                sb_has_bl = 0 if init_x else 1 if init_y + 16 < h4 else \
                    (b.edge_flags & 8)  # EDGE_I444_LEFT_HAS_BOTTOM

                # ---- luma palette (dav1d recon_tmpl.c:1228-1247) ----
                if b.pal_sz[0] and not init_x and not init_y:
                    yplane[4 * by:4 * by + bh4 * 4,
                           4 * bx:4 * bx + bw4 * 4] = \
                        b.pal[0][b.pal_idx_y].astype(yplane.dtype)

                # ---- luma ----
                y = init_y
                while y < sub_h4:
                    x = init_x
                    while x < sub_w4:
                        px, py = 4 * (bx + x), 4 * (by + y)
                        if b.pal_sz[0]:
                            x += tw
                            if not b.skip:
                                cb = next(coef_iter)
                                assert cb.plane == 0
                                if cb.eob >= 0:
                                    _itx_add_block(yplane, cb, b.tx,
                                                   bitdepth, residuals)
                            continue
                        angle = b.y_angle
                        edge_flags = (
                            (0 if ((y > init_y or not sb_has_tr) and
                                   (x + tw >= sub_w4)) else 1) |
                            (0 if (x > init_x or
                                   (not sb_has_bl and y + th >= sub_h4))
                             else 8))
                        m, angle, tl, c = prepare_intra_edges(
                            bx + x, bx + x > coder.col_start,
                            by + y, by + y > coder.row_start,
                            coder.col_end, coder.row_end, edge_flags,
                            yplane, px, py, b.y_mode, angle, tw, th,
                            ief, bitdepth)
                        pred = ip.intra_pred_ref(
                            m, tl, c, tw * 4, th * 4,
                            angle | intra_flags,
                            4 * bw - 4 * (bx + x), 4 * bh - 4 * (by + y),
                            bitdepth)
                        yplane[py:py + th * 4, px:px + tw * 4] = pred
                        if not b.skip:
                            cb = next(coef_iter)
                            assert cb.plane == 0 and cb.x == bx + x and \
                                cb.y == by + y
                            if cb.eob >= 0:
                                _itx_add_block(yplane, cb, b.tx, bitdepth,
                                               residuals)
                        x += tw
                    y += th

                if not has_chroma:
                    continue

                # ---- CFL / chroma prediction ----
                uplane, vplane = bufs.planes[1], bufs.planes[2]
                if b.uv_mode == CFL_PRED:
                    assert init_x == 0 and init_y == 0
                    ysrc_x = 4 * (bx & ~ss_hor)
                    ysrc_y = 4 * (by & ~ss_ver)
                    furthest_r = ((cw4 << ss_hor) + tw - 1) & ~(tw - 1)
                    furthest_b = ((ch4 << ss_ver) + th - 1) & ~(th - 1)
                    w_pad = cbw4 - (furthest_r >> ss_hor)
                    h_pad = cbh4 - (furthest_b >> ss_ver)
                    ysub = yplane[ysrc_y:ysrc_y + (cbh4 * 4 << ss_ver),
                                  ysrc_x:ysrc_x + (cbw4 * 4 << ss_hor)]
                    ac = ip.cfl_ac_ref(ysub, w_pad, h_pad, cbw4 * 4,
                                       cbh4 * 4, ss_hor, ss_ver)
                    for pl in range(2):
                        if not b.cfl_alpha[pl]:
                            continue
                        plane = bufs.planes[1 + pl]
                        xpos, ypos = bx >> ss_hor, by >> ss_ver
                        m, _, tl, c = prepare_intra_edges(
                            xpos, xpos > (coder.col_start >> ss_hor),
                            ypos, ypos > (coder.row_start >> ss_ver),
                            coder.col_end >> ss_hor,
                            coder.row_end >> ss_ver, 0,
                            plane, xpos * 4, ypos * 4, 0, 0,
                            ctw, cth, 0, bitdepth)
                        dc = ip.dc_value(tl, c, ctw * 4, cth * 4, m,
                                         bitdepth)
                        pred = ip.cfl_pred_ref(dc, ac[:cth * 4, :ctw * 4],
                                               b.cfl_alpha[pl], ctw * 4,
                                               cth * 4, bitdepth)
                        plane[ypos * 4:ypos * 4 + cth * 4,
                              xpos * 4:xpos * 4 + ctw * 4] = pred
                elif b.pal_sz[1]:
                    # chroma palette (dav1d recon_tmpl.c:1424-1446)
                    uvx, uvy = (bx >> ss_hor) * 4, (by >> ss_ver) * 4
                    for pl in (1, 2):
                        bufs.planes[pl][uvy:uvy + cbh4 * 4,
                                        uvx:uvx + cbw4 * 4] = \
                            b.pal[pl][b.pal_idx_uv].astype(yplane.dtype)

                sm_uv_fl = (sm_uv_flag(a_uvmode, (bx + init_x) >> ss_hor) |
                            sm_uv_flag(l_uvmode, cby4 + (init_y >> ss_ver)))
                uv_sb_has_tr = (1 if ((init_x + 16) >> ss_hor) < cw4 else
                                0 if init_y else
                                b.edge_flags & (4 >> (seq.layout - 1)))
                uv_sb_has_bl = (0 if init_x else
                                1 if ((init_y + 16) >> ss_ver) < ch4 else
                                b.edge_flags & (32 >> (seq.layout - 1)))
                sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                for pl in range(2):
                    plane = bufs.planes[1 + pl]
                    y = init_y >> ss_ver
                    while y < sub_ch4:
                        x = init_x >> ss_hor
                        while x < sub_cw4:
                            xpos = (bx >> ss_hor) + x
                            ypos = (by >> ss_ver) + y
                            ppx, ppy = xpos * 4, ypos * 4
                            do_pred = not ((b.uv_mode == CFL_PRED and
                                            b.cfl_alpha[pl]) or b.pal_sz[1])
                            if do_pred:
                                angle = b.uv_angle
                                edge_flags = (
                                    (0 if ((y > (init_y >> ss_ver) or
                                            not uv_sb_has_tr) and
                                           (x + ctw >= sub_cw4)) else 1) |
                                    (0 if (x > (init_x >> ss_hor) or
                                           (not uv_sb_has_bl and
                                            y + cth >= sub_ch4)) else 8))
                                uv_mode = 0 if b.uv_mode == CFL_PRED \
                                    else b.uv_mode
                                m, angle, tl, c = prepare_intra_edges(
                                    xpos,
                                    xpos > (coder.col_start >> ss_hor),
                                    ypos,
                                    ypos > (coder.row_start >> ss_ver),
                                    coder.col_end >> ss_hor,
                                    coder.row_end >> ss_ver,
                                    edge_flags, plane, ppx, ppy, uv_mode,
                                    angle, ctw, cth, ief, bitdepth)
                                angle |= ief_flag
                                pred = ip.intra_pred_ref(
                                    m, tl, c, ctw * 4, cth * 4,
                                    angle | sm_uv_fl,
                                    (4 * bw + ss_hor -
                                     4 * (bx & ~ss_hor)) >> ss_hor,
                                    (4 * bh + ss_ver -
                                     4 * (by & ~ss_ver)) >> ss_ver,
                                    bitdepth)
                                plane[ppy:ppy + cth * 4,
                                      ppx:ppx + ctw * 4] = pred
                            if not b.skip:
                                cb = next(coef_iter)
                                assert cb.plane == 1 + pl and \
                                    cb.x == xpos and cb.y == ypos, \
                                    (cb.plane, cb.x, cb.y, pl, xpos, ypos)
                                if cb.eob >= 0:
                                    _itx_add_block(plane, cb, b.uvtx,
                                                   bitdepth, residuals)
                            x += ctw
                        y += cth

        # update neighbour mode state
        y_mode_nofilt = 0 if b.y_mode == FILTER_PRED else b.y_mode
        a_mode[bx:bx + bw4] = y_mode_nofilt
        a_intra[bx:bx + bw4] = 1
        l_mode[by4:by4 + bh4] = y_mode_nofilt
        l_intra[by4:by4 + bh4] = 1
        if has_chroma:
            a_uvmode[(bx >> ss_hor):(bx >> ss_hor) + cbw4] = b.uv_mode
            l_uvmode[cby4:cby4 + cbh4] = b.uv_mode


def apply_inloop_filters(seq, fhdr, coders, bufs: FrameBuffers,
                         filters_mask: int = 7):
    """filters_mask: debug enable mask (dav1d Dav1dInloopFilterType):
    1 = deblock, 2 = CDEF, 4 = restoration; super-res always runs."""
    from ..host.lf import build_lf_arrays
    from ..ops.ref.loopfilter import calc_eih, apply_deblock

    bd = seq.bitdepth
    if (filters_mask & 1) and \
            (fhdr.loopfilter_level_y[0] or fhdr.loopfilter_level_y[1]):
        lf = build_lf_arrays(seq, fhdr, coders, bufs.width, bufs.height)
        e_lut, i_lut = calc_eih(fhdr.loopfilter_sharpness)
        sb_step4 = 32 if seq.sb128 else 16
        apply_deblock(bufs.planes[0], lf.edge_v_y, lf.edge_h_y, lf.lvl_y,
                      0, 1, e_lut, i_lut, (4, 8, 16), bd, sb_step4)
        if (len(bufs.planes) > 1 and
                (fhdr.loopfilter_level_u or fhdr.loopfilter_level_v)):
            csb_step4 = sb_step4 >> bufs.ss_ver
            for pl in (0, 1):
                apply_deblock(bufs.planes[1 + pl], lf.edge_v_uv,
                              lf.edge_h_uv, lf.lvl_uv, pl, pl, e_lut,
                              i_lut, (4, 6), bd, csb_step4)

    # snapshot post-deblock (pre-CDEF) rows for LR stripe boundaries
    restore_planes = sum((fhdr.restoration_type[p] != 0) << p
                         for p in range(3)) if (filters_mask & 4) else 0
    pre_cdef = [p.copy() for p in bufs.planes] if restore_planes else None

    # CDEF
    if (filters_mask & 2) and seq.cdef and \
            (any(fhdr.cdef_y_strength[:1 << fhdr.cdef_n_bits]) or
             any(fhdr.cdef_uv_strength[:1 << fhdr.cdef_n_bits])):
        from ..ops.ref.cdef import apply_cdef_frame
        bw4 = coders[0].bw
        bh4 = coders[0].bh
        n64x = (bw4 + 15) >> 4
        n64y = (bh4 + 15) >> 4
        cdef_idx_map = np.full((n64y, n64x), -1, np.int32)
        noskip = np.zeros((bh4, bw4), bool)
        for coder in coders:
            sb_step = coder.sb_step
            for (bx, by, idxs) in coder.cdef_idx:
                if sb_step == 32:  # 128px superblocks: 4 64x64 quadrants
                    for q, v in enumerate(idxs):
                        qx = (bx >> 4) + (q & 1)
                        qy = (by >> 4) + (q >> 1)
                        if qy < n64y and qx < n64x:
                            cdef_idx_map[qy, qx] = v
                else:
                    cdef_idx_map[by >> 4, bx >> 4] = idxs[0]
            from ..host.tilecoder import T_BLOCK_DIM
            for b in coder.blocks:
                if not b.skip:
                    bd_ = T_BLOCK_DIM[b.bs]
                    noskip[b.by:b.by + int(bd_[1]),
                           b.bx:b.bx + int(bd_[0])] = True
        apply_cdef_frame(bufs.planes, seq, fhdr, cdef_idx_map, noskip,
                         bw4, bh4, bufs.ss_hor, bufs.ss_ver)

    # super-resolution (dav1d recon_tmpl.c filter_sbrow_resize:2104;
    # whole-frame equivalent of the per-sbrow bands)
    if fhdr.width[0] != fhdr.width[1]:
        sr = _apply_super_res(seq, fhdr, coders, bufs)
        if restore_planes:
            pre_cdef = _apply_super_res(seq, fhdr, coders, bufs,
                                        planes=pre_cdef).planes
        bufs = sr

    # loop restoration
    if restore_planes:
        apply_lr(seq, fhdr, coders, bufs, pre_cdef, restore_planes)
    return bufs


def _ctrunc_div(a, b):
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _resize_params(in_w, out_w):
    """dav1d decode.c scale_fac:3517 + get_upscale_x0:3365 (C truncating
    division semantics)."""
    step = ((in_w << 14) + (out_w >> 1)) // out_w
    err = out_w * step - (in_w << 14)
    x0 = _ctrunc_div(-((out_w - in_w) << 13) + (out_w >> 1), out_w) + \
        128 - _ctrunc_div(err, 2)
    return step, x0 & 0x3FFF


def _apply_super_res(seq, fhdr, coders, bufs, planes=None):
    from ..ops.ref.mc import resize
    out = FrameBuffers(seq, fhdr, width=fhdr.width[1])
    bd = seq.bitdepth
    src_planes = planes if planes is not None else bufs.planes
    bw4f = ((fhdr.width[0] + 7) >> 3) << 1
    for pl, plane in enumerate(src_planes):
        ss_hor = bufs.ss_hor if pl else 0
        ss_ver = bufs.ss_ver if pl else 0
        in_w = (fhdr.width[0] + ss_hor) >> ss_hor
        out_w = (fhdr.width[1] + ss_hor) >> ss_hor
        step, start = _resize_params(in_w, out_w)
        src_w = (4 * bw4f + ss_hor) >> ss_hor
        h_vis = (fhdr.height + ss_ver) >> ss_ver
        res = resize(plane[:h_vis].astype(np.int32), out_w, h_vis, src_w,
                     step, start, bd)
        out.planes[pl][:h_vis, :out_w] = res.astype(out.planes[pl].dtype)
    return out


def apply_lr(seq, fhdr, coders, bufs, pre_cdef, restore_planes):
    from ..ops.ref.looprestoration import (pad_stripe, wiener_stripe,
                                           sgr_stripe, LR_HAVE_LEFT,
                                           LR_HAVE_RIGHT, LR_HAVE_TOP,
                                           LR_HAVE_BOTTOM,
                                           RESTORATION_WIENER)
    bd = seq.bitdepth
    lr_units = {}
    for coder in coders:
        lr_units.update(coder.lr_units)

    for p in range(len(bufs.planes)):
        if not ((restore_planes >> p) & 1):
            continue
        ss_ver = bufs.ss_ver if p else 0
        ss_hor = bufs.ss_hor if p else 0
        plane = bufs.planes[p]
        pre = pre_cdef[p]
        pre_lr = plane.copy()
        hh = (bufs.height + ss_ver) >> ss_ver
        ww = (bufs.width + ss_hor) >> ss_hor
        us_log2 = fhdr.restoration_unit_size[1 if p else 0]
        unit_size = 1 << us_log2
        half = unit_size >> 1
        max_unit = unit_size + half

        y = 0
        while y < hh:
            stripe_h = min((64 - 8 * (y == 0)) >> ss_ver, hh - y)
            # unit row lookup (dav1d lr_apply row_y/aligned_unit_pos logic)
            row_y = y + ((8 >> ss_ver) if y else 0)
            aligned = row_y & ~(unit_size - 1)
            if aligned and aligned + half > hh:
                aligned -= unit_size
            urow64 = (aligned << ss_ver) >> 6

            edges_base = ((LR_HAVE_TOP if y > 0 else 0) |
                          (LR_HAVE_BOTTOM if y + stripe_h < hh else 0))
            x = 0
            while x < ww:
                if x + max_unit <= ww:
                    uw = unit_size
                    last = False
                else:
                    uw = ww - x
                    last = True
                ucol64 = (x << ss_hor) >> 6
                lr = lr_units.get((p, urow64, ucol64))
                if lr is not None and lr["type"] != 0:
                    edges = edges_base | \
                        (LR_HAVE_LEFT if x > 0 else 0) | \
                        (0 if last else LR_HAVE_RIGHT)
                    xs = max(0, x - 3)
                    xe = min(x + uw + 3, plane.shape[1])
                    c0 = 3 - (x - xs)
                    c1 = c0 + (xe - xs)
                    p_ext = np.zeros((stripe_h, uw + 6), np.int32)
                    p_ext[:, c0:c1] = pre_lr[y:y + stripe_h, xs:xe]
                    left = pre_lr[y:y + stripe_h,
                                  max(0, x - 3):x].astype(np.int32)
                    if left.shape[1] < 3:
                        pad = np.zeros((stripe_h, 3 - left.shape[1]),
                                       np.int32)
                        left = np.concatenate([pad, left], axis=1)
                    above2 = np.zeros((2, uw + 6), np.int32)
                    below2 = np.zeros((2, uw + 6), np.int32)
                    if edges & LR_HAVE_TOP:
                        above2[:, c0:c1] = pre[y - 2:y, xs:xe]
                    if edges & LR_HAVE_BOTTOM:
                        below2[:, c0:c1] = \
                            pre[y + stripe_h:y + stripe_h + 2, xs:xe]
                    padded = pad_stripe(p_ext, left, above2, below2, uw,
                                        stripe_h, edges)
                    if lr["type"] == RESTORATION_WIENER:
                        wiener_stripe(plane, padded, x, y, uw, stripe_h,
                                      lr["filter_h"], lr["filter_v"], bd)
                    else:
                        sgr_stripe(plane, padded, x, y, uw, stripe_h,
                                   lr["type"], lr["sgr_weights"], bd)
                x += uw
            y += stripe_h


def decode_ivf(data: bytes, use_tpu_filters: bool = False,
               use_tpu_inter: bool = False):
    """Full IVF stream decode (intra + inter): returns list of plane tuples
    (visible). Thin wrapper over the public api.Decoder; use_tpu_filters /
    use_tpu_inter route pixel work through the jitted device pipelines."""
    from ..api import Decoder, Settings

    _, _, _, frames = parse_ivf(data)
    dec = Decoder(Settings(use_tpu_filters=use_tpu_filters,
                           use_tpu_inter=use_tpu_inter))
    out = []
    for fr in frames:
        dec.send_data(fr.data)
        while True:
            pic = dec.get_picture()
            if pic is None:
                break
            out.append(pic.planes)
    return out


def _visible(planes, bufs):
    w, hgt = bufs.width, bufs.height
    outp = [planes[0][:hgt, :w]]
    if len(planes) > 1:
        cw = (w + bufs.ss_hor) >> bufs.ss_hor
        ch = (hgt + bufs.ss_ver) >> bufs.ss_ver
        outp += [p[:ch, :cw] for p in planes[1:]]
    return outp


def _tile_payload(st, tile_idx, fhdr):
    """Extract tile #tile_idx's msac payload from the tile groups."""
    n_tiles = fhdr.tiling.cols * fhdr.tiling.rows
    for tg in st.tiles:
        if not (tg.start <= tile_idx <= tg.end):
            continue
        data = tg.data
        pos = 0
        for ti in range(tg.start, tg.end + 1):
            is_last = ti == tg.end
            if is_last:
                sz = len(data) - pos
            else:
                n_bytes = fhdr.tiling.n_bytes
                sz = int.from_bytes(data[pos:pos + n_bytes], "little") + 1
                pos += n_bytes
            if ti == tile_idx:
                return data[pos:pos + sz], 0, sz
            pos += sz
    raise ValueError(f"tile {tile_idx} not found")
