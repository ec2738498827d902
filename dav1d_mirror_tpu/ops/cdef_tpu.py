"""CDEF on device (JAX/XLA, bit-exact).

TPU formulation: every 8x8 block is independent (reads come from the
pre-CDEF snapshot). Direction search becomes a batched matmul of the 64
block pixels against precomputed one-hot partial-sum matrices (MXU work);
the constrained filter uses 25 precomputed shifted full-plane views with
per-pixel direction-indexed tap selection — no scalar loops anywhere.

Bit-exact vs ops/ref/cdef.py (tested), itself e2e-verified against dav1d.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ref.cdef import CDEF_DIRECTIONS

MISSING = -32768

# ---- direction search constants ----
_DIV = np.array([840, 420, 280, 210, 168, 140, 120], np.int64)


def _build_partial_mats():
    """Returns list of (assignment one-hot (64, nbins), weights (nbins,))
    for the 8 cost classes in dav1d's cost order (diag0, alt0, hv0, alt1,
    diag1, alt2, hv1, alt3) mapped to cost indices 0..7."""
    # mapping per the reference cdef_find_dir partial sums:
    fns = {
        0: (15, lambda y, x: y + x),            # partial_sum_diag[0]
        1: (11, lambda y, x: y + (x >> 1)),     # partial_sum_alt[0]
        2: (8, lambda y, x: y),                 # hv[0]
        3: (11, lambda y, x: 3 + y - (x >> 1)),  # alt[1]
        4: (15, lambda y, x: 7 + y - x),        # diag[1]
        5: (11, lambda y, x: 3 - (y >> 1) + x),  # alt[2]
        6: (8, lambda y, x: x),                 # hv[1]
        7: (11, lambda y, x: (y >> 1) + x),     # alt[3]
    }
    out = []
    for n in range(8):
        nbins, fn = fns[n]
        A = np.zeros((64, nbins), np.int32)
        for y in range(8):
            for x in range(8):
                A[y * 8 + x, fn(y, x)] = 1
        out.append(A)
    return out


_PARTIAL_MATS = _build_partial_mats()


def _cost_weights():
    """Per-class weight vectors for the squared partial sums."""
    w = {}
    d = _DIV
    # diag classes (15 bins): bins 0..6 -> div[n]; 7 -> 105; 8..14 -> div[14-n]
    diag_w = np.zeros(15, np.int64)
    for n in range(7):
        diag_w[n] = d[n]
        diag_w[14 - n] = d[n]
    diag_w[7] = 105
    # hv (8 bins): all 105
    hv_w = np.full(8, 105, np.int64)
    # alt (11 bins): bins 3..7 -> 105; bins 0..2 -> div[2m+1]; 10-m mirror
    alt_w = np.zeros(11, np.int64)
    alt_w[3:8] = 105
    for m in range(3):
        alt_w[m] = d[2 * m + 1]
        alt_w[10 - m] = d[2 * m + 1]
    return [diag_w, alt_w, hv_w, alt_w, diag_w, alt_w, hv_w, alt_w]


_COST_W = _cost_weights()

# tap shift pool: all (dy, dx) with |dy|<=2, |dx|<=2
_SHIFTS = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]
_SHIFT_IDX = {s: i for i, s in enumerate(_SHIFTS)}


def _tap_maps():
    """For each dir 0..7: pri taps (4 entries: +-off for k=0,1) and sec taps
    (8 entries), as indices into the shift pool."""
    pri = np.zeros((8, 2, 2), np.int32)  # [dir][k][sign]
    sec = np.zeros((8, 2, 2, 2), np.int32)  # [dir][class(2|0)][k][sign]
    for dir_ in range(8):
        for k in range(2):
            dy, dx = CDEF_DIRECTIONS[dir_ + 2][k]
            pri[dir_, k, 0] = _SHIFT_IDX[(dy, dx)]
            pri[dir_, k, 1] = _SHIFT_IDX[(-dy, -dx)]
            for ci, doff in enumerate((4, 0)):
                dy2, dx2 = CDEF_DIRECTIONS[dir_ + doff][k]
                sec[dir_, ci, k, 0] = _SHIFT_IDX[(dy2, dx2)]
                sec[dir_, ci, k, 1] = _SHIFT_IDX[(-dy2, -dx2)]
    return pri, sec


_PRI_TAPS, _SEC_TAPS = _tap_maps()


def cdef_dir_tpu(plane, h8, w8, bitdepth):
    """plane: (H, W) >= (h8*8, w8*8). Returns (dir (h8, w8), var (h8, w8))."""
    bd_m8 = bitdepth - 8
    px = (plane[:h8 * 8, :w8 * 8].astype(jnp.int32) >> bd_m8) - 128
    blocks = px.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    blocks = blocks.astype(jnp.float32)  # sums fit exactly in f32? see below

    # costs use uint32 wrapping arithmetic (matches the reference's
    # `unsigned cost[8]` semantics exactly, including pathological inputs)
    costs = []
    for n in range(8):
        A = jnp.asarray(_PARTIAL_MATS[n], jnp.float32)
        sums = jnp.dot(blocks, A, preferred_element_type=jnp.float32)
        sums = sums.astype(jnp.int32).astype(jnp.uint32)
        w = jnp.asarray(_COST_W[n].astype(np.uint32))
        costs.append(jnp.sum(sums * sums * w, axis=1, dtype=jnp.uint32))
    cost = jnp.stack(costs, axis=1)  # (nblk, 8) uint32
    best_dir = jnp.argmax(cost, axis=1).astype(jnp.int32)
    best_cost = jnp.max(cost, axis=1)
    alt = jnp.take_along_axis(cost, (best_dir ^ 4)[:, None], axis=1)[:, 0]
    var = ((best_cost - alt) >> 10).astype(jnp.int32)
    # ties: argmax picks the first max, same as the reference's scan
    return best_dir.reshape(h8, w8), var.reshape(h8, w8)


def _constrain_v(diff, threshold, shift):
    adiff = jnp.abs(diff)
    v = jnp.minimum(adiff, jnp.maximum(0, threshold - (adiff >> shift)))
    return jnp.where(diff >= 0, v, -v)


def _ulog2(x):
    """floor(log2(x)) for x >= 1, elementwise (x <= 2^16)."""
    r = jnp.zeros_like(x)
    v = x
    for sh in (8, 4, 2, 1):
        m = v >= (1 << sh)
        r = r + jnp.where(m, sh, 0)
        v = jnp.where(m, v >> sh, v)
    return r


def cdef_filter_plane_tpu(plane, src, dir_map, pri_map, sec_map, damping,
                          active, bitdepth, bw, bh, halo=None):
    """plane/src: (H, W) int32 (src = pre-CDEF snapshot); dir_map, pri_map,
    sec_map, active: per-block (hb, wb) maps at this plane's block size
    (bw x bh px); damping scalar. Frame borders use MISSING padding.
    Only the first (hb*bh, wb*wb) region is filtered.

    halo: optional (top2, bot2) — real pre-CDEF pixel rows ((2, W) each)
    to use above/below the region instead of MISSING. Used by the
    row-band-sharded pipeline (parallel/filter_shard), where band
    boundaries are frame-interior."""
    hb, wb = dir_map.shape
    H = hb * bh
    W = wb * bw
    reg = src[:H, :W].astype(jnp.int32)
    pad = jnp.pad(reg, 2, constant_values=MISSING)
    if halo is not None:
        top2, bot2 = halo
        pad = pad.at[0:2, 2:2 + W].set(top2[:, :W].astype(jnp.int32))
        pad = pad.at[H + 2:H + 4, 2:2 + W].set(
            bot2[:, :W].astype(jnp.int32))
    shifts = jnp.stack([pad[2 + dy:2 + dy + H, 2 + dx:2 + dx + W]
                        for (dy, dx) in _SHIFTS], axis=0)  # (25, H, W)

    # per-pixel maps
    def expand(a):
        return jnp.repeat(jnp.repeat(a, bh, axis=0), bw, axis=1)

    dir_px = expand(dir_map)
    pri_px = expand(pri_map)
    sec_px = expand(sec_map)
    act_px = expand(active)

    px = reg
    bd_m8 = bitdepth - 8
    pri_tap0 = 4 - ((pri_px >> bd_m8) & 1)
    pri_shift = jnp.maximum(0, damping - _ulog2(jnp.maximum(pri_px, 1)))
    sec_shift = damping - _ulog2(jnp.maximum(sec_px, 1))

    sum_ = jnp.zeros_like(px)
    mn = px
    mx = px
    have_pri = pri_px > 0
    have_sec = sec_px > 0
    use_minmax = have_pri & have_sec

    # Per-pixel tap selection WITHOUT a gather: the direction map only
    # takes 8 values, so each tap is a masked sum of statically-shifted
    # planes (VPU selects) — a gather over the (25, H, W) stack is
    # orders of magnitude slower on TPU.
    dmask = [dir_px == d for d in range(8)]

    def tap(static_idx_for_dir):
        acc = jnp.full_like(px, MISSING)
        for d in range(8):
            acc = jnp.where(dmask[d], shifts[int(static_idx_for_dir(d))],
                            acc)
        return acc

    for k in range(2):
        tapk = pri_tap0 if k == 0 else ((pri_tap0 & 3) | 2)
        for sign in range(2):
            p = tap(lambda d: _PRI_TAPS[d, k, sign])
            valid = (p != MISSING) & have_pri
            c = _constrain_v(p - px, pri_px, pri_shift)
            sum_ = sum_ + jnp.where(valid, tapk * c, 0)
            mn = jnp.where(valid & use_minmax, jnp.minimum(mn, p), mn)
            mx = jnp.where(valid & use_minmax, jnp.maximum(mx, p), mx)
        for ci in range(2):
            for sign in range(2):
                s = tap(lambda d: _SEC_TAPS[d, ci, k, sign])
                valid = (s != MISSING) & have_sec
                c = _constrain_v(s - px, sec_px, sec_shift)
                sum_ = sum_ + jnp.where(valid, (2 - k) * c, 0)
                mn = jnp.where(valid & use_minmax, jnp.minimum(mn, s), mn)
                mx = jnp.where(valid & use_minmax, jnp.maximum(mx, s), mx)

    v = px + ((sum_ - (sum_ < 0).astype(jnp.int32) + 8) >> 4)
    v = jnp.where(use_minmax, jnp.clip(v, mn, mx), v)
    out_reg = jnp.where(act_px & (have_pri | have_sec), v, plane[:H, :W])
    out = plane.at[:H, :W].set(out_reg)
    return out


def adjust_strength_v(strength, var):
    vs = var >> 6
    i = jnp.where(vs > 0, jnp.minimum(_ulog2(jnp.maximum(vs, 1)), 12), 0)
    adj = (strength * (4 + i) + 8) >> 4
    return jnp.where(var > 0, adj, 0)


UV_DIRS_TBL = np.array([[0, 1, 2, 3, 4, 5, 6, 7],
                        [7, 0, 2, 4, 5, 6, 6, 6]], np.int32)


@functools.partial(jax.jit, static_argnames=("bitdepth", "ss_hor", "ss_ver",
                                             "damping", "monochrome"))
def cdef_frame_tpu(planes, cdef_idx_map, noskip4, y_strengths, uv_strengths,
                   damping, bitdepth, ss_hor, ss_ver, monochrome):
    """planes: tuple of (H, W) int32; cdef_idx_map: (n64y, n64x) int32;
    noskip4: (bh4, bw4) bool; y/uv_strengths: (8,) int32 header strengths.
    Returns filtered planes (same shapes)."""
    bd_m8 = bitdepth - 8
    n64y, n64x = cdef_idx_map.shape
    bh4, bw4 = noskip4.shape
    h8, w8 = (bh4 + 1) // 2, (bw4 + 1) // 2

    # per-8x8 maps
    idx8 = jnp.repeat(jnp.repeat(cdef_idx_map, 8, axis=0), 8, axis=1)
    idx8 = idx8[:h8, :w8]
    ns = noskip4
    if bh4 % 2 or bw4 % 2:
        ns = jnp.pad(ns, ((0, bh4 % 2), (0, bw4 % 2)))
    ns8 = (ns.reshape(h8, 2, w8, 2).any(axis=(1, 3)))
    valid = (idx8 >= 0) & ns8
    sel = jnp.maximum(idx8, 0)
    y_lvl = jnp.asarray(y_strengths)[sel]
    uv_lvl = jnp.asarray(uv_strengths)[sel]
    valid = valid & ((y_lvl > 0) | (uv_lvl > 0))

    y_pri = (y_lvl >> 2) << bd_m8
    y_sec0 = y_lvl & 3
    y_sec = (y_sec0 + (y_sec0 == 3)) << bd_m8
    uv_pri = (uv_lvl >> 2) << bd_m8
    uv_sec0 = uv_lvl & 3
    uv_sec = (uv_sec0 + (uv_sec0 == 3)) << bd_m8

    dirm, varm = cdef_dir_tpu(planes[0], h8, w8, bitdepth)
    y_adj = adjust_strength_v(y_pri, varm)
    pri_map = jnp.where(y_pri > 0, y_adj, 0)
    dir_y = jnp.where(y_pri > 0, dirm, 0)
    act_y = valid & (y_lvl > 0)

    out0 = cdef_filter_plane_tpu(planes[0].astype(jnp.int32),
                                 planes[0].astype(jnp.int32), dir_y,
                                 pri_map, jnp.where(act_y, y_sec, 0),
                                 damping, act_y, bitdepth, 8, 8)
    outs = [out0]
    if not monochrome:
        uvd = jnp.asarray(UV_DIRS_TBL[1 if (ss_hor and not ss_ver) else 0])
        dir_uv = jnp.where(uv_pri > 0, uvd[dirm], 0)
        act_uv = valid & (uv_lvl > 0)
        for pl in (1, 2):
            outs.append(cdef_filter_plane_tpu(
                planes[pl].astype(jnp.int32), planes[pl].astype(jnp.int32),
                dir_uv, jnp.where(act_uv, uv_pri, 0),
                jnp.where(act_uv, uv_sec, 0), damping - 1, act_uv,
                bitdepth, 8 >> ss_hor, 8 >> ss_ver))
    return tuple(outs)
