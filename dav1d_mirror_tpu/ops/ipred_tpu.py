"""Device intra prediction: per-unit predictors in pure JAX.

The TPU-native redesign of dav1d's intra kernels (src/ipred_tmpl.c:93-542,
src/ipred_prepare_tmpl.c:76): instead of decode-order per-block calls, a
wavefront scan (models/tpu_intra.py) batches all prediction units whose
neighbours are complete and calls `pred_main_tile` / `pred_filter_cell`
under vmap. Every unit's 257-entry top-left edge buffer is rebuilt on
device from two plane strips plus host-precomputed availability geometry
(host/tilecoder knows all of it after the entropy pass), so the scan's
only sequential state is the reconstructed planes themselves.

All arithmetic is integer and bit-exact with the numpy reference
(ops/ref/ipred.py), which itself is oracle-verified.

Unit params are an int32 vector; field indices in P_* (shared with
models/tpu_intra.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data.tables import TABLES

# physical output tile (units larger than this are split into windows)
TILE = 16
# padded-plane margins (models/tpu_intra pads planes with these)
PAD = 160  # right/bottom margin; left/top margin is PADT
PADT = 8

# implementation modes (ops/ref/ipred.py order) + extras
(DC_PRED, VERT_PRED, HOR_PRED, LEFT_DC_PRED, TOP_DC_PRED, DC_128_PRED,
 Z1_PRED, Z2_PRED, Z3_PRED, SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED,
 PAETH_PRED, FILTER_PRED) = range(14)
CFL_MODE = 14
PAL_MODE = 15

# ---- param vector fields ----
(P_PLANE, P_PX, P_PY, P_OX, P_OY, P_W, P_H, P_MODE,
 P_HAVE_LEFT, P_HAVE_TOP, P_NEEDS_LEFT, P_NEEDS_TOP, P_NEEDS_TL,
 P_NEEDS_TR, P_NEEDS_BL, P_PXH_LEFT, P_PXH_BL, P_PXH_TOP, P_PXH_TR,
 P_HTFR, P_Z2TLF,
 P_DC_USE_TOP, P_DC_USE_LEFT, P_DC_BIAS, P_DC_SH1, P_DC_MULT, P_DC_SH2,
 P_DX, P_DY, P_US_ABOVE, P_US_LEFT, P_FS_ABOVE, P_FS_LEFT,
 P_MAX_BASE_X, P_MAX_BASE_Y,
 P_FLT_SZ_T, P_FLT_LIM_FROM_T, P_FLT_LIM_TO_T, P_FLT_FRM_T, P_FLT_TO_T,
 P_FLT_SZ_L, P_FLT_LIM_FROM_L, P_FLT_LIM_TO_L, P_FLT_FRM_L, P_FLT_TO_L,
 P_UPS_HSZ_T, P_UPS_FRM_T, P_UPS_TO_T,
 P_UPS_HSZ_L, P_UPS_FRM_L, P_UPS_TO_L,
 P_MISC,           # filter: filt_idx; cfl: alpha (signed)
 P_YSRC_X, P_YSRC_Y, P_CFL_WCL, P_CFL_HCL, P_CFL_LOG2SZ,
 P_BPX, P_BPY, P_VALID) = range(60)
NPARAMS = 60

_SM_WEIGHTS = jnp.asarray(np.asarray(TABLES["sm_weights"], np.int32))
# padded so w+ox..+16 windows stay in-bounds for any (w<=64, ox<=48)
_SM_WEIGHTS_PAD = jnp.asarray(np.concatenate(
    [np.asarray(TABLES["sm_weights"], np.int32), np.zeros(32, np.int32)]))


def _filter_taps():
    raw = np.asarray(TABLES["filter_intra_taps"], np.int64).astype(np.int32)
    out = np.zeros((5, 8, 7), np.int32)
    for f in range(5):
        for k in range(8):
            out[f, k] = [raw[f, 2 * k], raw[f, 2 * k + 1],
                         raw[f, 16 + 2 * k], raw[f, 16 + 2 * k + 1],
                         raw[f, 32 + 2 * k], raw[f, 32 + 2 * k + 1],
                         raw[f, 48 + 2 * k]]
    return out


_FILTER_TAPS_NP = _filter_taps()
_FILTER_TAPS = jnp.asarray(_FILTER_TAPS_NP)

_EDGE_KERNELS_NP = np.array([[0, 4, 8, 4, 0], [0, 5, 6, 5, 0],
                             [2, 4, 4, 4, 2]], np.int32)
_EDGE_KERNELS = jnp.asarray(_EDGE_KERNELS_NP)

C = 128  # edge-buffer center


# ------------------------------------------------------------------
# gather-free vector indexing
#
# TPU dynamic gathers carry a large fixed per-op cost (~70us even for a
# 256-element take), and the predictors index small edge vectors dozens
# of times per unit. Every traced-index lookup therefore goes through a
# one-hot contraction instead: values here are < 2^24, so a float32
# matmul reproduces the integer exactly, and the MXU eats the whole
# batch in one fused op.
# ------------------------------------------------------------------
def _take(vec, idx, n):
    """vec: (n,) int32; idx: scalar or (...) int32 pre-clipped to
    [0, n-1]. Returns vec[idx] elementwise, exact (values < 2^24)."""
    idx = jnp.asarray(idx)
    oh = jax.nn.one_hot(idx.reshape(-1), n, dtype=jnp.float32)
    flat = jnp.matmul(oh, vec.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    return flat.reshape(idx.shape).astype(jnp.int32)


def _take_t(table, idx):
    """static int table (n, ...); idx traced scalar or (...)."""
    tn = np.asarray(table)
    t = jnp.asarray(tn.reshape(tn.shape[0], -1), jnp.float32)
    idx = jnp.asarray(idx)
    oh = jax.nn.one_hot(idx.reshape(-1), tn.shape[0], dtype=jnp.float32)
    out = jnp.matmul(oh, t, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + tn.shape[1:]).astype(jnp.int32)


# ------------------------------------------------------------------
# edge assembly (ipred_prepare_tmpl.c semantics, branchless)
# ------------------------------------------------------------------
def edge_build(top_strip, left_strip, p, bitdepth):
    """top_strip[i] = plane[py-1, px-1+i] (i in 0..129);
    left_strip[j] = plane[py-1+j, px-1] (j in 0..129).
    Returns edge[257] (center C=128), int32."""
    have_left = p[P_HAVE_LEFT]
    have_top = p[P_HAVE_TOP]
    bd_half = (1 << bitdepth) >> 1

    # fills
    fill_left = jnp.where(p[P_HTFR] > 0, top_strip[1], bd_half + 1)
    fill_top = jnp.where(have_left > 0, left_strip[1], bd_half - 1)

    # ---- left column (edge[C-1-j] = left[j], j = 0..127) ----
    j = jnp.arange(128, dtype=jnp.int32)
    szl = p[P_H]
    # combined strip index for main-left / bottom-left / replication:
    # j < szl -> 1 + min(j, pxh_left-1); j >= szl and have_bl ->
    # 1 + szl + min(j - szl, pxh_bl-1); else replicate left[szl-1]
    last_idx = 1 + jnp.minimum(szl - 1, p[P_PXH_LEFT] - 1)
    li = jnp.where(j < szl, 1 + jnp.minimum(j, p[P_PXH_LEFT] - 1),
                   jnp.where(p[P_PXH_BL] > 0,
                             1 + szl + jnp.minimum(j - szl,
                                                   p[P_PXH_BL] - 1),
                             last_idx))
    lvals = _take(left_strip, jnp.clip(li, 0, 129), 130)
    # !have_left -> the whole region (incl. bottom-left, which requires
    # have_left) is the fill value
    leftv = jnp.where((p[P_NEEDS_LEFT] > 0) &
                      (j < jnp.where(p[P_NEEDS_BL] > 0, 2 * szl, szl)),
                      jnp.where(have_left > 0, lvals, fill_left), 0)

    # ---- top row (edge[C+1+i] = top[i], i = 0..127) ----
    i = jnp.arange(128, dtype=jnp.int32)
    szt = p[P_W]
    tlast_idx = 1 + jnp.minimum(szt - 1, p[P_PXH_TOP] - 1)
    ti = jnp.where(i < szt, 1 + jnp.minimum(i, p[P_PXH_TOP] - 1),
                   jnp.where(p[P_PXH_TR] > 0,
                             1 + szt + jnp.minimum(i - szt,
                                                   p[P_PXH_TR] - 1),
                             tlast_idx))
    tvals = _take(top_strip, jnp.clip(ti, 0, 129), 130)
    topv = jnp.where(have_top > 0, tvals, fill_top)
    topv = jnp.where((p[P_NEEDS_TOP] > 0) &
                     (i < jnp.where(p[P_NEEDS_TR] > 0, 2 * szt, szt)),
                     topv, 0)

    # ---- topleft ----
    tl_have_l = jnp.where(have_top > 0, top_strip[0], left_strip[1])
    tl_no_l = jnp.where(have_top > 0, top_strip[1], bd_half)
    tlv = jnp.where(have_left > 0, tl_have_l, tl_no_l)
    tlv = jnp.where(p[P_NEEDS_TL] > 0, tlv, 0)

    # Z2 topleft filter (prepare_intra_edges tail); edge[C-1] = leftv[0],
    # edge[C+1] = topv[0]
    filt_tl = ((leftv[0] + topv[0]) * 5 + tlv * 6 + 8) >> 4
    tlv = jnp.where(p[P_Z2TLF] > 0, filt_tl, tlv)

    # edge = [left reversed | topleft | top] — pure concatenation
    edge = jnp.concatenate([leftv[::-1].astype(jnp.int32),
                            tlv.astype(jnp.int32)[None],
                            topv.astype(jnp.int32)])
    return edge


# ------------------------------------------------------------------
# generic edge filtering / upsampling over the edge buffer
# (ops/ref/ipred.py filter_edge / upsample_edge)
# ------------------------------------------------------------------
def _edge_take(edge, base, idx, frm, to):
    """edge[base + clip(idx, frm, to-1)] via one-hot contraction; idx of
    any shape."""
    k = base + jnp.clip(idx, frm, to - 1)
    return _take(edge, jnp.clip(k, 0, 256), 257)


def filter_edge_j(edge, base, sz, lim_from, lim_to, frm, to, strength,
                  n_out):
    """n_out static; returns (n_out,), entries >= sz unspecified-as-ref
    (index clamped)."""
    i = jnp.arange(n_out, dtype=jnp.int32)
    ker = _take_t(_EDGE_KERNELS_NP, jnp.maximum(strength - 1, 0))
    taps = _edge_take(edge, base,
                      i[:, None] - 2 + jnp.arange(5)[None, :], frm, to)
    s = jnp.sum(taps * ker[None, :], axis=1)
    filt = (s + 8) >> 4
    raw = taps[:, 2]
    use_raw = (i < jnp.minimum(sz, lim_from)) | (i >= jnp.minimum(lim_to,
                                                                  sz))
    return jnp.where(use_raw, raw, filt)


_UPS_K = np.asarray([-1, 9, 9, -1], np.int32)


def upsample_edge_j(edge, base, hsz, frm, to, bitdepth, n_out):
    """returns (n_out,) with the 2*hsz-1 upsample pattern (even entries =
    src, odd = 4-tap)."""
    i = jnp.arange(n_out, dtype=jnp.int32)
    half = i >> 1
    taps = _edge_take(edge, base,
                      half[:, None] - 1 + jnp.arange(4)[None, :], frm, to)
    src = taps[:, 1]
    bd_max = (1 << bitdepth) - 1
    s = jnp.sum(taps * jnp.asarray(_UPS_K)[None, :], axis=1)
    odd = jnp.clip((s + 8) >> 4, 0, bd_max)
    # the final entry (i == 2*(hsz-1)) is a plain copy
    return jnp.where((i & 1) == 0, src, odd)


# ------------------------------------------------------------------
# per-unit main predictor: (16,16) window at (ox, oy)
# ------------------------------------------------------------------
def _dc_value(edge, p):
    i = jnp.arange(128, dtype=jnp.int32)
    top_sum = jnp.sum(jnp.where(i < p[P_W], edge[C + 1:C + 129], 0))
    left_sum = jnp.sum(jnp.where(i < p[P_H], edge[C - 128:C][::-1], 0))
    dc = (p[P_DC_BIAS] + top_sum * p[P_DC_USE_TOP] +
          left_sum * p[P_DC_USE_LEFT]) >> p[P_DC_SH1]
    dc = (dc * p[P_DC_MULT]) >> p[P_DC_SH2]
    return dc


def pred_main_tile(top_strip, left_strip, own, luma_reg, p, bitdepth,
                   ss_hor, ss_ver):
    """top_strip/left_strip: 130-px strips at the unit's top-left
    (plane[bpy-1, bpx-1..], plane[bpy-1.., bpx-1]); own: the (16,16)
    current-plane window at (px,py) (palette passthrough); luma_reg:
    (64,64) luma window at (ysrc_y, ysrc_x) for CFL. Returns the (16,16)
    int32 prediction (clipped where the reference clips)."""
    w, h = p[P_W], p[P_H]
    mode = p[P_MODE]
    bd_max = (1 << bitdepth) - 1

    edge = edge_build(top_strip, left_strip, p, bitdepth)

    gx = p[P_OX] + jnp.arange(TILE, dtype=jnp.int32)[None, :]
    gy = p[P_OY] + jnp.arange(TILE, dtype=jnp.int32)[:, None]
    gxb = jnp.broadcast_to(gx, (TILE, TILE))
    gyb = jnp.broadcast_to(gy, (TILE, TILE))

    # top/left rows are contiguous windows of the edge buffer
    top_row = jax.lax.dynamic_slice(edge, (C + 1 + p[P_OX],), (TILE,))
    left_col = jax.lax.dynamic_slice(edge, (C - TILE - p[P_OY],),
                                     (TILE,))[::-1]
    top_g = jnp.broadcast_to(top_row[None, :], (TILE, TILE))
    left_g = jnp.broadcast_to(left_col[:, None], (TILE, TILE))
    tl = edge[C]

    # ---- DC family / CFL dc ----
    dc = _dc_value(edge, p)

    # ---- VERT / HOR ----
    vert = top_g
    hor = left_g

    # ---- PAETH ----
    base = left_g + top_g - tl
    ldiff = jnp.abs(left_g - base)
    tdiff = jnp.abs(top_g - base)
    tldiff = jnp.abs(tl - base)
    paeth = jnp.where((ldiff <= tdiff) & (ldiff <= tldiff), left_g,
                      jnp.where(tdiff <= tldiff, top_g, tl))

    # ---- SMOOTH family ----
    wh_row = jax.lax.dynamic_slice(_SM_WEIGHTS_PAD,
                                   (w + p[P_OX],), (TILE,))
    wv_col = jax.lax.dynamic_slice(_SM_WEIGHTS_PAD,
                                   (h + p[P_OY],), (TILE,))
    wh_w = jnp.broadcast_to(wh_row[None, :], (TILE, TILE))
    wv_w = jnp.broadcast_to(wv_col[:, None], (TILE, TILE))
    sc = _take(edge, jnp.stack([C + w, C - h, C + 1, C - 1]), 257)
    right = sc[0]
    bottom = sc[1]
    smooth = (wv_w * top_g + (256 - wv_w) * bottom +
              wh_w * left_g + (256 - wh_w) * right + 256) >> 9
    smooth_v = (wv_w * top_g + (256 - wv_w) * bottom + 128) >> 8
    smooth_h = (wh_w * left_g + (256 - wh_w) * right + 128) >> 8

    # ---- Z family derived edges ----
    # top array (z1): upsampled / filtered / raw, indexed 0..255
    z1_flt = filter_edge_j(edge, C + 1, p[P_FLT_SZ_T], p[P_FLT_LIM_FROM_T],
                           p[P_FLT_LIM_TO_T], p[P_FLT_FRM_T], p[P_FLT_TO_T],
                           p[P_FS_ABOVE], 256)
    z1_ups = upsample_edge_j(edge, C + 1, p[P_UPS_HSZ_T], p[P_UPS_FRM_T],
                             p[P_UPS_TO_T], bitdepth, 256)
    i256 = jnp.arange(256, dtype=jnp.int32)
    z1_raw = jnp.concatenate([edge[C + 1:], jnp.full(128, edge[256],
                                                     jnp.int32)])
    z_top = jnp.where(p[P_US_ABOVE] > 0, z1_ups,
                      jnp.where(p[P_FS_ABOVE] > 0, z1_flt, z1_raw))

    # left array (z3): larr[k] == "left_arr[left_c - k]"
    z3_flt = filter_edge_j(edge, C - (w + h), p[P_FLT_SZ_L],
                           p[P_FLT_LIM_FROM_L], p[P_FLT_LIM_TO_L],
                           p[P_FLT_FRM_L], p[P_FLT_TO_L], p[P_FS_LEFT],
                           256)
    z3_ups = upsample_edge_j(edge, C - (w + h), p[P_UPS_HSZ_L],
                             p[P_UPS_FRM_L], p[P_UPS_TO_L], bitdepth, 256)
    # raw: left_arr = tl, left_c = C-1 -> larr[k] = edge[C-1-k]
    z3_raw = jnp.concatenate([edge[:C][::-1], jnp.full(128, edge[0],
                                                       jnp.int32)])
    # filtered: left_c = w+h-1 -> larr[k] = flt[w+h-1-k]
    k_f = jnp.clip(w + h - 1 - i256, 0, 255)
    # upsampled: left_c = 2*(w+h)-2 -> larr[k] = ups[2*(w+h)-2-k]
    k_u = jnp.clip(2 * (w + h) - 2 - i256, 0, 255)
    z_left = jnp.where(p[P_US_LEFT] > 0, _take(z3_ups, k_u, 256),
                       jnp.where(p[P_FS_LEFT] > 0, _take(z3_flt, k_f,
                                                         256), z3_raw))

    # ---- Z1 ----
    xpos1 = p[P_DX] * (gyb + 1)
    frac1 = xpos1 & 0x3E
    base1 = (xpos1 >> 6) + (1 + p[P_US_ABOVE]) * gxb
    b1c = jnp.minimum(base1, p[P_MAX_BASE_X])
    z1v = (_take(z_top, b1c, 256) * (64 - frac1) +
           _take(z_top, jnp.minimum(b1c + 1, 255), 256) * frac1 + 32) >> 6
    z1_last = _take(z_top, p[P_MAX_BASE_X], 256)
    z1 = jnp.where(base1 < p[P_MAX_BASE_X], z1v, z1_last)

    # ---- Z3 ----
    ypos3 = p[P_DY] * (gxb + 1)
    frac3 = ypos3 & 0x3E
    base3 = (ypos3 >> 6) + (1 + p[P_US_LEFT]) * gyb
    b3c = jnp.minimum(base3, p[P_MAX_BASE_Y])
    z3v = (_take(z_left, b3c, 256) * (64 - frac3) +
           _take(z_left, jnp.minimum(b3c + 1, 255), 256) * frac3 + 32) >> 6
    z3_last = _take(z_left, p[P_MAX_BASE_Y], 256)
    z3 = jnp.where(base3 < p[P_MAX_BASE_Y], z3v, z3_last)

    # ---- Z2 ----
    # edge2: 129 entries, center EC=64 (ops/ref/ipred.py _z2)
    EC = 64
    e2i = jnp.arange(129, dtype=jnp.int32)
    # top part: entries EC+1..EC+2w (upsample) or EC+1..EC+w
    z2t_ups = upsample_edge_j(edge, C, p[P_W] + 1, 0, p[P_W] + 1,
                              bitdepth, 129)
    z2t_flt = filter_edge_j(edge, C + 1, p[P_W], 0, p[P_FLT_LIM_TO_T],
                            -1, p[P_W], p[P_FS_ABOVE], 129)
    kk = e2i - EC  # offset from center (top side: kk >= 1)
    top_part = jnp.where(
        p[P_US_ABOVE] > 0,
        _take(z2t_ups, jnp.clip(kk, 0, 128), 129),
        jnp.where(p[P_FS_ABOVE] > 0,
                  _take(z2t_flt, jnp.clip(kk - 1, 0, 128), 129),
                  edge[C - EC:C - EC + 129]))
    # left part: entries EC-2h..EC-1 (upsample: ups over h+1 from C-h,
    #   edge2[ec-2h..ec] = ups) / EC-h..EC-1 filtered or raw
    z2l_ups = upsample_edge_j(edge, C - h, p[P_H] + 1, 0, p[P_H] + 1,
                              bitdepth, 129)
    z2l_flt = filter_edge_j(edge, C - h, p[P_H], p[P_H] - p[P_FLT_LIM_TO_L],
                            p[P_H], 0, p[P_H] + 1, p[P_FS_LEFT], 129)
    neg = EC - e2i  # left side: neg >= 1; edge2[EC - n]
    # upsample: edge2[ec - 2h + m] = ups[m] -> edge2[EC-n] = ups[2h-n]
    lu = _take(z2l_ups, jnp.clip(2 * h - neg, 0, 128), 129)
    # filtered: edge2[ec-h + m] = flt[m] -> edge2[EC-n] = flt[h-n]
    lf = _take(z2l_flt, jnp.clip(h - neg, 0, 128), 129)
    lr_ = edge[C - 128:C + 1][::-1][jnp.clip(neg, 0, 128)] \
        if False else _take(edge, C - jnp.clip(neg, 0, 128), 257)
    left_part = jnp.where(p[P_US_LEFT] > 0, lu,
                          jnp.where(p[P_FS_LEFT] > 0, lf, lr_))
    edge2 = jnp.where(e2i > EC, top_part,
                      jnp.where(e2i < EC, left_part, edge[C]))
    # NOTE: upsample top writes edge2[EC] too (ups[0] == edge[C]) and the
    # reference then overwrites edge2[ec] = tl[c]; identical value.

    xpos2 = ((1 + p[P_US_ABOVE]) << 6) - p[P_DX] * (gyb + 1)
    base_x2 = (xpos2 >> 6) + (1 + p[P_US_ABOVE]) * gxb
    frac_x2 = xpos2 & 0x3E
    ypos2 = (gyb << (6 + p[P_US_LEFT])) - p[P_DY] * (gxb + 1)
    base_y2 = ypos2 >> 6
    frac_y2 = ypos2 & 0x3E
    left_c2 = EC - (1 + p[P_US_LEFT])
    vx = (_take(edge2, jnp.clip(EC + base_x2, 0, 128), 129) *
          (64 - frac_x2) +
          _take(edge2, jnp.clip(EC + base_x2 + 1, 0, 128), 129) *
          frac_x2)
    vy = (_take(edge2, jnp.clip(left_c2 - base_y2, 0, 128), 129) *
          (64 - frac_y2) +
          _take(edge2, jnp.clip(left_c2 - (base_y2 + 1), 0, 128), 129) *
          frac_y2)
    z2 = (jnp.where(base_x2 >= 0, vx, vy) + 32) >> 6

    # ---- CFL ----
    ds = _cfl_ac_ds(luma_reg, ss_hor, ss_ver)
    # replicate-pad + mean removal
    cw_i = jnp.arange(32, dtype=jnp.int32)
    rsel = jax.nn.one_hot(jnp.minimum(cw_i, p[P_CFL_HCL] - 1), 32,
                          dtype=jnp.float32)
    csel = jax.nn.one_hot(jnp.minimum(cw_i, p[P_CFL_WCL] - 1), 32,
                          dtype=jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    ac_full = jnp.matmul(
        jnp.matmul(rsel, ds.astype(jnp.float32), precision=hi),
        csel.T, precision=hi).astype(jnp.int32)
    mask = (cw_i[:, None] < h) & (cw_i[None, :] < w)
    total = jnp.sum(jnp.where(mask, ac_full, 0))
    log2sz = p[P_CFL_LOG2SZ]
    avg = (total + ((1 << log2sz) >> 1)) >> log2sz
    ac = ac_full - avg
    ac_win = jax.lax.dynamic_slice(
        jnp.pad(ac, ((0, TILE), (0, TILE))),
        (p[P_OY], p[P_OX]), (TILE, TILE))
    alpha = p[P_MISC]
    diff = alpha * ac_win
    cfl = dc + jnp.sign(diff) * ((jnp.abs(diff) + 32) >> 6)
    cfl = jnp.clip(cfl, 0, bd_max)

    # PAL: passthrough (palette pixels pre-placed in the plane) = `own`

    dc_tile = jnp.full((TILE, TILE), dc, jnp.int32)
    is_dc = (mode == DC_PRED) | (mode == LEFT_DC_PRED) | \
            (mode == TOP_DC_PRED) | (mode == DC_128_PRED)
    pred = jnp.where(is_dc, dc_tile, 0)
    pred = jnp.where(mode == VERT_PRED, vert, pred)
    pred = jnp.where(mode == HOR_PRED, hor, pred)
    pred = jnp.where(mode == PAETH_PRED, paeth, pred)
    pred = jnp.where(mode == SMOOTH_PRED, smooth, pred)
    pred = jnp.where(mode == SMOOTH_V_PRED, smooth_v, pred)
    pred = jnp.where(mode == SMOOTH_H_PRED, smooth_h, pred)
    pred = jnp.where(mode == Z1_PRED, z1, pred)
    pred = jnp.where(mode == Z2_PRED, z2, pred)
    pred = jnp.where(mode == Z3_PRED, z3, pred)
    pred = jnp.where(mode == CFL_MODE, cfl, pred)
    pred = jnp.where(mode == PAL_MODE, own, pred)
    return pred


def _cfl_ac_ds(luma_reg, ss_hor, ss_ver):
    """Downsampled (32,32) luma for CFL ac (ops/ref/ipred.py cfl_ac_ref
    inner sum), scaled by << (1 + !ss_ver + !ss_hor)."""
    ysub = luma_reg[:(32 << ss_ver), :(32 << ss_hor)]
    s = ysub[::(1 << ss_ver), ::(1 << ss_hor)].astype(jnp.int32)
    if ss_hor:
        s = s + ysub[::(1 << ss_ver), 1::2]
    if ss_ver:
        s = s + ysub[1::2, ::(1 << ss_hor)]
        if ss_hor:
            s = s + ysub[1::2, 1::2]
    return s << (1 + (not ss_ver) + (not ss_hor))


# ------------------------------------------------------------------
# filter intra: one 4x4 cell (two sequential 4x2 units)
# ------------------------------------------------------------------
def pred_filter_cell(planes_pad, predp_pad, p, bitdepth):
    """Returns (4,4) int32 prediction for a filter-intra cell at
    (px,py) inside its parent block at (bpx,bpy). In-block neighbour
    pixels come from the prediction plane (predp_pad); block-external
    edges from the reconstructed plane via the standard edge buffer."""
    px, py = p[P_PX], p[P_PY]
    bpx, bpy = p[P_BPX], p[P_BPY]
    bd_max = (1 << bitdepth) - 1
    flt = _take_t(_FILTER_TAPS_NP, p[P_MISC])  # (8, 7)

    # edge buffer of the parent block
    top_strip = jax.lax.dynamic_slice(
        planes_pad, (bpy - 1 + PADT, bpx - 1 + PADT), (1, 130))[0]
    left_strip = jax.lax.dynamic_slice(
        planes_pad, (bpy - 1 + PADT, bpx - 1 + PADT), (130, 1))[:, 0]
    edge = edge_build(top_strip, left_strip, p, bitdepth)

    ox, oy = p[P_OX], p[P_OY]

    # top row source (y = -1 relative to the cell): 5 pixels at x-1..x+3
    # from pred plane if oy > 0 else from edge (block top row)
    xi = jnp.arange(-1, 4, dtype=jnp.int32)
    ptop = jax.lax.dynamic_slice(predp_pad, (py - 1 + PADT, px - 1 + PADT),
                                 (1, 5))[0]
    # edge top: edge[C + 1 + ox + k] for k >= 0; k == -1 -> topleft chain:
    #   x == 0 -> edge[C] else left... for oy == 0 the row above is the
    #   block's top edge: get(-1, ox + xi): xi + ox >= 0 -> edge[C+1+..],
    #   xi + ox == -1 -> edge[C]
    etop = jnp.where(ox + xi >= 0,
                     _take(edge, C + 1 + jnp.clip(ox + xi, 0, 127), 257),
                     edge[C])
    top5 = jnp.where(oy > 0, ptop, etop)
    # except: the corner (x-1, y-1): when oy>0 and ox==0 the left column
    # source applies for x==-1 -> block left edge at row oy-1
    corner_left_edge = _take(edge, C - 1 - jnp.clip(oy - 1, 0, 127), 257)
    top5 = top5.at[0].set(
        jnp.where((oy > 0) & (ox == 0), corner_left_edge, top5[0]))

    # left col source (x = -1): rows oy..oy+3: from pred plane if ox > 0
    # else block left edge
    pleft = jax.lax.dynamic_slice(predp_pad, (py + PADT, px - 1 + PADT),
                                  (4, 1))[:, 0]
    eleft = jax.lax.dynamic_slice(edge, (C - 4 - oy,), (4,))[::-1]
    left4 = jnp.where(ox > 0, pleft, eleft)

    out = jnp.zeros((4, 4), jnp.int32)
    # unit 0: rows 0-1; unit 1: rows 2-3 (depends on unit 0 outputs)
    def unit(out, uy, top_row):
        # top_row: 5 px (x-1..x+3) above this unit
        p0 = top_row[0]
        p1, p2, p3, p4 = top_row[1], top_row[2], top_row[3], top_row[4]
        p5 = left4[uy * 2]
        p6 = left4[uy * 2 + 1]
        pxv = jnp.stack([p0, p1, p2, p3, p4, p5, p6])
        acc = flt @ pxv  # (8,)
        vals = jnp.clip((acc + 8) >> 4, 0, bd_max).reshape(2, 4)
        out = jax.lax.dynamic_update_slice(out, vals, (uy * 2, 0))
        return out

    out = unit(out, 0, top5)
    # unit 1 top row: (x-1) = left4[1]; x..x+3 = out row 1
    top_row1 = jnp.concatenate([left4[1:2], out[1]])
    out = unit(out, 1, top_row1)
    return out
