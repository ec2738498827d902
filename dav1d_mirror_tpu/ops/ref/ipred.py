"""NumPy reference for AV1 intra prediction (bit-exact).

Implementation-order mode indices (dav1d src/ipred.h:36-49 layout):
DC=0, VERT=1, HOR=2, LEFT_DC=3, TOP_DC=4, DC_128=5, Z1=6, Z2=7, Z3=8,
SMOOTH=9, SMOOTH_V=10, SMOOTH_H=11, PAETH=12, FILTER=13.

`topleft` is a 1D array with `center` pointing at the top-left corner sample;
[center+1:] is the top row (up to 2*w entries), [center-1::-1] walks down the
left column. Semantics per AV1 spec, cross-checked vs dav1d src/ipred_tmpl.c.
"""
from __future__ import annotations

import numpy as np

from ...data.tables import TABLES

SM_WEIGHTS = TABLES["sm_weights"]
DR_INTRA_DERIVATIVE = TABLES["dr_intra_derivative"]


def _deinterleave_filter_taps():
    """The extracted dav1d_filter_intra_taps is in the x86-interleaved
    layout (tables.c F() macro); convert to canonical (5, 8 px, 7 taps)."""
    raw = TABLES["filter_intra_taps"].astype(np.int32)  # [5][64]
    out = np.zeros((5, 8, 7), np.int32)
    for f in range(5):
        for k in range(8):
            out[f, k] = [raw[f, 2 * k], raw[f, 2 * k + 1],
                         raw[f, 16 + 2 * k], raw[f, 16 + 2 * k + 1],
                         raw[f, 32 + 2 * k], raw[f, 32 + 2 * k + 1],
                         raw[f, 48 + 2 * k]]
    return out


FILTER_INTRA_TAPS = _deinterleave_filter_taps()  # (5, 8, 7)

(DC_PRED, VERT_PRED, HOR_PRED, LEFT_DC_PRED, TOP_DC_PRED, DC_128_PRED,
 Z1_PRED, Z2_PRED, Z3_PRED, SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED,
 PAETH_PRED, FILTER_PRED) = range(14)


def _top(tl, c, n):
    return tl[c + 1:c + 1 + n].astype(np.int32)

def _left(tl, c, n):
    # left[i] = tl[c - 1 - i]
    return tl[c - n:c][::-1].astype(np.int32)


def _ctz(v):
    return (v & -v).bit_length() - 1


def dc_value(tl, c, w, h, mode, bitdepth):
    if mode == DC_128_PRED:
        return (1 << bitdepth) >> 1 if bitdepth > 8 else 128
    if mode == TOP_DC_PRED:
        dc = (w >> 1) + int(_top(tl, c, w).sum())
        return dc >> _ctz(w)
    if mode == LEFT_DC_PRED:
        dc = (h >> 1) + int(_left(tl, c, h).sum())
        return dc >> _ctz(h)
    dc = (w + h) >> 1
    dc += int(_top(tl, c, w).sum()) + int(_left(tl, c, h).sum())
    dc >>= _ctz(w + h)
    if w != h:
        if bitdepth == 8:
            mult_1x2, mult_1x4, base = 0x5556, 0x3334, 16
        else:
            mult_1x2, mult_1x4, base = 0xAAAB, 0x6667, 17
        dc *= mult_1x4 if (w > h * 2 or h > w * 2) else mult_1x2
        dc >>= base
    return dc


def _splat(v, w, h):
    return np.full((h, w), v, np.int32)


def get_filter_strength(wh, angle, is_sm):
    if is_sm:
        if wh <= 8:
            if angle >= 64:
                return 2
            if angle >= 40:
                return 1
        elif wh <= 16:
            if angle >= 48:
                return 2
            if angle >= 20:
                return 1
        elif wh <= 24:
            if angle >= 4:
                return 3
        else:
            return 3
    else:
        if wh <= 8:
            if angle >= 56:
                return 1
        elif wh <= 16:
            if angle >= 40:
                return 1
        elif wh <= 24:
            if angle >= 32:
                return 3
            if angle >= 16:
                return 2
            if angle >= 8:
                return 1
        elif wh <= 32:
            if angle >= 32:
                return 3
            if angle >= 4:
                return 2
            return 1
        else:
            return 3
    return 0


def get_upsample(wh, angle, is_sm):
    return int(angle < 40 and wh <= (16 >> is_sm))


_EDGE_KERNELS = np.array([[0, 4, 8, 4, 0], [0, 5, 6, 5, 0], [2, 4, 4, 4, 2]],
                         np.int32)


def filter_edge(sz, lim_from, lim_to, arr, base, frm, to, strength):
    """reads arr[base + clip(i, frm, to-1)] (frm may be negative)."""
    out = np.zeros(sz, np.int32)
    ker = _EDGE_KERNELS[strength - 1]
    for i in range(sz):
        if i < min(sz, lim_from) or i >= min(lim_to, sz):
            out[i] = arr[base + int(np.clip(i, frm, to - 1))]
        else:
            s = 0
            for j in range(5):
                s += int(arr[base + int(np.clip(i - 2 + j, frm, to - 1))]) \
                    * int(ker[j])
            out[i] = (s + 8) >> 4
    return out


def upsample_edge(hsz, arr, base, frm, to, bitdepth):
    out = np.zeros(2 * hsz - 1, np.int32)
    bd_max = (1 << bitdepth) - 1
    for i in range(hsz - 1):
        out[i * 2] = arr[base + int(np.clip(i, frm, to - 1))]
        s = 0
        for j, k in enumerate((-1, 9, 9, -1)):
            s += int(arr[base + int(np.clip(i + j - 1, frm, to - 1))]) * k
        out[i * 2 + 1] = np.clip((s + 8) >> 4, 0, bd_max)
    out[(hsz - 1) * 2] = arr[base + int(np.clip(hsz - 1, frm, to - 1))]
    return out


def intra_pred_ref(mode, tl, c, w, h, angle, max_w, max_h, bitdepth):
    """Returns (h, w) int32 prediction."""
    tl = tl.astype(np.int32)
    bd_max = (1 << bitdepth) - 1

    if mode in (DC_PRED, TOP_DC_PRED, LEFT_DC_PRED, DC_128_PRED):
        return _splat(dc_value(tl, c, w, h, mode, bitdepth), w, h)

    if mode == VERT_PRED:
        return np.tile(_top(tl, c, w), (h, 1))

    if mode == HOR_PRED:
        return np.tile(_left(tl, c, h)[:, None], (1, w))

    if mode == PAETH_PRED:
        topleft = int(tl[c])
        top = _top(tl, c, w)[None, :]
        left = _left(tl, c, h)[:, None]
        base = left + top - topleft
        ldiff = np.abs(left - base)
        tdiff = np.abs(top - base)
        tldiff = np.abs(topleft - base)
        return np.where((ldiff <= tdiff) & (ldiff <= tldiff),
                        np.broadcast_to(left, (h, w)),
                        np.where(tdiff <= tldiff,
                                 np.broadcast_to(top, (h, w)), topleft))

    if mode == SMOOTH_PRED:
        wh = SM_WEIGHTS[w:w + w].astype(np.int32)
        wv = SM_WEIGHTS[h:h + h].astype(np.int32)
        right = int(tl[c + w])
        bottom = int(tl[c - h])
        top = _top(tl, c, w)[None, :]
        left = _left(tl, c, h)[:, None]
        pred = (wv[:, None] * top + (256 - wv[:, None]) * bottom +
                wh[None, :] * left + (256 - wh[None, :]) * right)
        return (pred + 256) >> 9

    if mode == SMOOTH_V_PRED:
        wv = SM_WEIGHTS[h:h + h].astype(np.int32)
        bottom = int(tl[c - h])
        top = _top(tl, c, w)[None, :]
        pred = wv[:, None] * top + (256 - wv[:, None]) * bottom
        return (pred + 128) >> 8

    if mode == SMOOTH_H_PRED:
        wh = SM_WEIGHTS[w:w + w].astype(np.int32)
        right = int(tl[c + w])
        left = _left(tl, c, h)[:, None]
        pred = wh[None, :] * left + (256 - wh[None, :]) * right
        return (pred + 128) >> 8

    if mode == Z1_PRED:
        return _z1(tl, c, w, h, angle, bitdepth)
    if mode == Z2_PRED:
        return _z2(tl, c, w, h, angle, max_w, max_h, bitdepth)
    if mode == Z3_PRED:
        return _z3(tl, c, w, h, angle, bitdepth)

    if mode == FILTER_PRED:
        return _filter(tl, c, w, h, angle, bitdepth)

    raise ValueError(mode)


def _native_lib():
    """Native Z1/Z2/Z3 inner loops (native/ipred.cpp); None -> Python."""
    from ...host import native
    return native.LIB


def _z1(tl, c, w, h, angle_in, bitdepth):
    is_sm = (angle_in >> 9) & 1
    eief = angle_in >> 10
    angle = angle_in & 511
    dx = int(DR_INTRA_DERIVATIVE[angle >> 1])
    upsample_above = get_upsample(w + h, 90 - angle, is_sm) if eief else 0
    if upsample_above:
        top = upsample_edge(w + h, tl, c + 1, -1, w + min(w, h), bitdepth)
        max_base_x = 2 * (w + h) - 2
        dx <<= 1
    else:
        fs = get_filter_strength(w + h, 90 - angle, is_sm) if eief else 0
        if fs:
            top = filter_edge(w + h, 0, w + h, tl, c + 1, -1,
                              w + min(w, h), fs)
            max_base_x = w + h - 1
        else:
            top = tl[c + 1:c + 1 + w + min(w, h)].astype(np.int32)
            max_base_x = w + min(w, h) - 1
    base_inc = 1 + upsample_above
    out = np.zeros((h, w), np.int32)
    nat = _native_lib()
    if nat is not None:
        top = np.ascontiguousarray(top, np.int32)
        nat.ipred_z1_loop(top.ctypes.data, max_base_x, dx, base_inc, w,
                          h, out.ctypes.data)
        return out
    for y in range(h):
        xpos = dx * (y + 1)
        frac = xpos & 0x3E
        base = xpos >> 6
        for x in range(w):
            if base < max_base_x:
                v = int(top[base]) * (64 - frac) + int(top[base + 1]) * frac
                out[y, x] = (v + 32) >> 6
            else:
                out[y, x:] = top[max_base_x]
                break
            base += base_inc
    return out


def _z2(tl, c, w, h, angle_in, max_w, max_h, bitdepth):
    is_sm = (angle_in >> 9) & 1
    eief = angle_in >> 10
    angle = angle_in & 511
    dy = int(DR_INTRA_DERIVATIVE[(angle - 90) >> 1])
    dx = int(DR_INTRA_DERIVATIVE[(180 - angle) >> 1])
    upsample_left = get_upsample(w + h, 180 - angle, is_sm) if eief else 0
    upsample_above = get_upsample(w + h, angle - 90, is_sm) if eief else 0
    # edge buffer indexed via center at 64
    edge = np.zeros(64 + 64 + 1, np.int32)
    ec = 64
    if upsample_above:
        up = upsample_edge(w + 1, tl, c, 0, w + 1, bitdepth)
        edge[ec:ec + 2 * w + 1] = up
        dx <<= 1
    else:
        fs = get_filter_strength(w + h, angle - 90, is_sm) if eief else 0
        if fs:
            edge[ec + 1:ec + 1 + w] = filter_edge(w, 0, max_w, tl, c + 1,
                                                  -1, w, fs)
        else:
            edge[ec + 1:ec + 1 + w] = tl[c + 1:c + 1 + w]
    if upsample_left:
        up = upsample_edge(h + 1, tl, c - h, 0, h + 1, bitdepth)
        edge[ec - h * 2:ec + 1] = up
        dy <<= 1
    else:
        fs = get_filter_strength(w + h, 180 - angle, is_sm) if eief else 0
        if fs:
            edge[ec - h:ec] = filter_edge(h, h - max_h, h, tl, c - h, 0,
                                          h + 1, fs)
        else:
            edge[ec - h:ec] = tl[c - h:c]
    edge[ec] = tl[c]

    base_inc_x = 1 + upsample_above
    left_c = ec - (1 + upsample_left)
    out = np.zeros((h, w), np.int32)
    nat = _native_lib()
    if nat is not None:
        nat.ipred_z2_loop(edge.ctypes.data + 4 * ec, dx, dy,
                          upsample_above, upsample_left, w, h,
                          out.ctypes.data)
        return out
    for y in range(h):
        xpos = ((1 + upsample_above) << 6) - dx * (y + 1)
        base_x = xpos >> 6
        frac_x = xpos & 0x3E
        ypos = (y << (6 + upsample_left)) - dy
        for x in range(w):
            if base_x >= 0:
                v = int(edge[ec + base_x]) * (64 - frac_x) + \
                    int(edge[ec + base_x + 1]) * frac_x
            else:
                base_y = ypos >> 6
                frac_y = ypos & 0x3E
                v = int(edge[left_c - base_y]) * (64 - frac_y) + \
                    int(edge[left_c - (base_y + 1)]) * frac_y
            out[y, x] = (v + 32) >> 6
            base_x += base_inc_x
            ypos -= dy
    return out


def _z3(tl, c, w, h, angle_in, bitdepth):
    is_sm = (angle_in >> 9) & 1
    eief = angle_in >> 10
    angle = angle_in & 511
    dy = int(DR_INTRA_DERIVATIVE[(270 - angle) >> 1])
    upsample_left = get_upsample(w + h, angle - 180, is_sm) if eief else 0
    if upsample_left:
        # in = topleft_in[-(w+h)..]; left = &out[2*(w+h)-2]
        arr = upsample_edge(w + h, tl, c - (w + h), max(w - h, 0),
                            w + h + 1, bitdepth)
        left_arr, left_c = arr, 2 * (w + h) - 2
        max_base_y = 2 * (w + h) - 2
        dy <<= 1
    else:
        fs = get_filter_strength(w + h, angle - 180, is_sm) if eief else 0
        if fs:
            arr = filter_edge(w + h, 0, w + h, tl, c - (w + h),
                              max(w - h, 0), w + h + 1, fs)
            left_arr, left_c = arr, w + h - 1
            max_base_y = w + h - 1
        else:
            left_arr, left_c = tl.astype(np.int32), c - 1
            max_base_y = h + min(w, h) - 1
    base_inc = 1 + upsample_left
    out = np.zeros((h, w), np.int32)
    nat = _native_lib()
    if nat is not None:
        la = np.ascontiguousarray(left_arr, np.int32)
        nat.ipred_z3_loop(la.ctypes.data + 4 * left_c, max_base_y, dy,
                          base_inc, w, h, out.ctypes.data)
        return out
    for x in range(w):
        ypos = dy * (x + 1)
        frac = ypos & 0x3E
        base = ypos >> 6
        for y in range(h):
            if base < max_base_y:
                v = int(left_arr[left_c - base]) * (64 - frac) + \
                    int(left_arr[left_c - (base + 1)]) * frac
                out[y, x] = (v + 32) >> 6
            else:
                out[y:, x] = left_arr[left_c - max_base_y]
                break
            base += base_inc
    return out


def _filter(tl, c, w, h, filt_idx, bitdepth):
    filt_idx &= 511
    flt = FILTER_INTRA_TAPS[filt_idx]  # (8, 7)
    bd_max = (1 << bitdepth) - 1
    # working canvas: top/left edges + dst
    out = np.zeros((h, w), np.int32)

    def get(px_y, px_x):
        # coordinates relative to block: y=-1 row = top, x=-1 col = left
        if px_y < 0:
            return int(tl[c + 1 + px_x]) if px_x >= 0 else int(tl[c])
        if px_x < 0:
            return int(tl[c - 1 - px_y])
        return int(out[px_y, px_x])

    for y in range(0, h, 2):
        for x in range(0, w, 4):
            p0 = get(y - 1, x - 1)
            p1, p2, p3, p4 = (get(y - 1, x), get(y - 1, x + 1),
                              get(y - 1, x + 2), get(y - 1, x + 3))
            p5, p6 = get(y, x - 1), get(y + 1, x - 1)
            px = (p0, p1, p2, p3, p4, p5, p6)
            for yy in range(2):
                for xx in range(4):
                    k = yy * 4 + xx
                    acc = sum(int(flt[k, t]) * px[t] for t in range(7))
                    out[y + yy, x + xx] = np.clip((acc + 8) >> 4, 0, bd_max)
    return out


def cfl_ac_ref(ypx, w_pad, h_pad, cw, ch, ss_hor, ss_ver):
    """ypx: (ch << ss_ver, >= cw << ss_hor) luma pixels. Returns (ch, cw)
    int32 ac."""
    ac = np.zeros((ch, cw), np.int32)
    ypx = ypx.astype(np.int32)
    for y in range(ch - 4 * h_pad):
        for x in range(cw - 4 * w_pad):
            s = int(ypx[y << ss_ver, x << ss_hor])
            if ss_hor:
                s += int(ypx[y << ss_ver, x * 2 + 1])
            if ss_ver:
                s += int(ypx[(y << ss_ver) + 1, x << ss_hor])
                if ss_hor:
                    s += int(ypx[(y << ss_ver) + 1, x * 2 + 1])
            ac[y, x] = s << (1 + (not ss_ver) + (not ss_hor))
        for x in range(cw - 4 * w_pad, cw):
            ac[y, x] = ac[y, x - 1]
    for y in range(ch - 4 * h_pad, ch):
        ac[y] = ac[y - 1]
    log2sz = (cw.bit_length() - 1) + (ch.bit_length() - 1)
    sum_ = ((1 << log2sz) >> 1) + int(ac.sum())
    sum_ >>= log2sz
    return ac - sum_


def cfl_pred_ref(dc, ac, alpha, w, h, bitdepth):
    diff = alpha * ac.astype(np.int32)
    v = dc + np.sign(diff) * ((np.abs(diff) + 32) >> 6)
    return np.clip(v, 0, (1 << bitdepth) - 1)


def pal_pred_ref(pal, idx, w, h):
    """pal: (8,), idx: (h, w) values 0-7."""
    return pal.astype(np.int32)[idx]
