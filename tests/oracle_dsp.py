"""ctypes bindings to liboracle_dsp.so (reference C DSP kernels).

Test-only: the golden side of our checkasm-analogue kernel tests.
"""
from __future__ import annotations

import ctypes as ct
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "oracle", "build",
                         "liboracle_dsp.so")
_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = ct.CDLL(os.path.abspath(_LIB_PATH))
    return _lib


def have_oracle() -> bool:
    return os.path.exists(_LIB_PATH)


def _sfx(bitdepth: int) -> str:
    return "_8bpc" if bitdepth == 8 else "_16bpc"


def _pix_dtype(bitdepth: int):
    return np.uint8 if bitdepth == 8 else np.uint16


def _coef_dtype(bitdepth: int):
    return np.int16 if bitdepth == 8 else np.int32


def itx_add(dst: np.ndarray, coeff: np.ndarray, eob: int, tx: int, txtp: int,
            bitdepth: int) -> np.ndarray:
    """dst: (h, w) pixels; coeff: (sh, sw) int — de-transposed layout
    coeff[y, x]. Returns the reference result."""
    sh, sw = coeff.shape
    h, w = dst.shape
    out = np.ascontiguousarray(dst.astype(_pix_dtype(bitdepth)))
    # dav1d coef buffer layout: buf[y + x*sh]
    buf = np.zeros(sw * sh, _coef_dtype(bitdepth))
    for x in range(sw):
        buf[x * sh:(x + 1) * sh] = coeff[:, x]
    fn = getattr(lib(), "oracle_itx_add" + _sfx(bitdepth))
    esz = out.dtype.itemsize
    fn(out.ctypes.data_as(ct.c_void_p), ct.c_ssize_t(w * esz),
       buf.ctypes.data_as(ct.c_void_p), ct.c_int(eob), ct.c_int(tx),
       ct.c_int(txtp), ct.c_int(bitdepth), ct.c_int((1 << bitdepth) - 1))
    return out


def intra_pred(mode: int, topleft: np.ndarray, w: int, h: int, angle: int,
               max_w: int, max_h: int, bitdepth: int) -> np.ndarray:
    """topleft: 1D pixel array centered on the top-left sample; the C function
    receives a pointer to the center element. Layout (ipred.h:36-49):
    topleft[center] = the corner pixel; [center+1..] = top row (2*w entries
    may be read); [center-1 ...] = left column downward (2*h entries)."""
    tl = np.ascontiguousarray(topleft.astype(_pix_dtype(bitdepth)))
    center = len(tl) // 2
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_intra_pred" + _sfx(bitdepth))
    ptr = tl.ctypes.data_as(ct.c_void_p)
    ptr = ct.c_void_p(ptr.value + center * esz)
    fn(ct.c_int(mode), dst.ctypes.data_as(ct.c_void_p), ct.c_ssize_t(w * esz),
       ptr, ct.c_int(w), ct.c_int(h), ct.c_int(angle), ct.c_int(max_w),
       ct.c_int(max_h), ct.c_int((1 << bitdepth) - 1))
    return dst


def cfl_ac(layout: int, ypx: np.ndarray, w_pad: int, h_pad: int, cw: int,
           ch: int, bitdepth: int) -> np.ndarray:
    """layout: 1=420, 2=422, 3=444. ypx: (ch<<ss_ver, cw<<ss_hor) luma."""
    y = np.ascontiguousarray(ypx.astype(_pix_dtype(bitdepth)))
    ac = np.zeros(32 * 32, np.int16)
    esz = y.dtype.itemsize
    fn = getattr(lib(), "oracle_cfl_ac" + _sfx(bitdepth))
    fn(ct.c_int(layout - 1), ac.ctypes.data_as(ct.c_void_p),
       y.ctypes.data_as(ct.c_void_p), ct.c_ssize_t(y.shape[1] * esz),
       ct.c_int(w_pad), ct.c_int(h_pad), ct.c_int(cw), ct.c_int(ch))
    return ac[:cw * ch].reshape(ch, cw)


def cfl_pred(mode: int, topleft: np.ndarray, w: int, h: int, ac: np.ndarray,
             alpha: int, bitdepth: int) -> np.ndarray:
    tl = np.ascontiguousarray(topleft.astype(_pix_dtype(bitdepth)))
    center = len(tl) // 2
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    acb = np.ascontiguousarray(ac.astype(np.int16)).reshape(-1)
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_cfl_pred" + _sfx(bitdepth))
    ptr = tl.ctypes.data_as(ct.c_void_p)
    ptr = ct.c_void_p(ptr.value + center * esz)
    fn(ct.c_int(mode), dst.ctypes.data_as(ct.c_void_p), ct.c_ssize_t(w * esz),
       ptr, ct.c_int(w), ct.c_int(h), acb.ctypes.data_as(ct.c_void_p),
       ct.c_int(alpha), ct.c_int((1 << bitdepth) - 1))
    return dst


def pal_pred(pal: np.ndarray, idx: np.ndarray, w: int, h: int,
             bitdepth: int) -> np.ndarray:
    """pal: (8,) pixels; idx: (h, w) packed? dav1d takes 2 px/byte packed
    indices; we pack here from unpacked (h, w) values 0..7."""
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    p = np.ascontiguousarray(pal.astype(_pix_dtype(bitdepth)))
    flat = idx.reshape(-1).astype(np.uint8)
    packed = (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)
    packed = np.ascontiguousarray(packed)
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_pal_pred" + _sfx(bitdepth))
    fn(dst.ctypes.data_as(ct.c_void_p), ct.c_ssize_t(w * esz),
       p.ctypes.data_as(ct.c_void_p), packed.ctypes.data_as(ct.c_void_p),
       ct.c_int(w), ct.c_int(h))
    return dst


# ---- motion compensation ----

def _pp(a):
    return a.ctypes.data_as(ct.c_void_p)


def _px_at(a, r, c):
    ptr = a.ctypes.data_as(ct.c_void_p)
    return ct.c_void_p(ptr.value + (r * a.shape[1] + c) * a.dtype.itemsize)


def mc_put(filter2d, src_win, w, h, mx, my, bitdepth):
    """src_win: (h+7, w+7) window, nominal origin at (3, 3)."""
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    dst = np.zeros((h, max(w, 1)), _pix_dtype(bitdepth))
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_mc_put" + _sfx(bitdepth))
    fn(ct.c_int(filter2d), _pp(dst), ct.c_ssize_t(dst.shape[1] * esz),
       _px_at(s, 3, 3), ct.c_ssize_t(s.shape[1] * esz),
       ct.c_int(w), ct.c_int(h), ct.c_int(mx), ct.c_int(my),
       ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32)


def mc_prep(filter2d, src_win, w, h, mx, my, bitdepth):
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    tmp = np.zeros((h, w), np.int16)
    fn = getattr(lib(), "oracle_mc_prep" + _sfx(bitdepth))
    fn(ct.c_int(filter2d), _pp(tmp), _px_at(s, 3, 3),
       ct.c_ssize_t(s.shape[1] * s.dtype.itemsize),
       ct.c_int(w), ct.c_int(h), ct.c_int(mx), ct.c_int(my),
       ct.c_int((1 << bitdepth) - 1))
    return tmp.astype(np.int32)


def mc_put_scaled(filter2d, src_win, w, h, mx, my, dx, dy, bitdepth):
    """src_win: (tmp_h, W) window, nominal origin at (3, 3)."""
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_mc_put_scaled" + _sfx(bitdepth))
    fn(ct.c_int(filter2d), _pp(dst), ct.c_ssize_t(w * esz),
       _px_at(s, 3, 3), ct.c_ssize_t(s.shape[1] * esz),
       ct.c_int(w), ct.c_int(h), ct.c_int(mx), ct.c_int(my),
       ct.c_int(dx), ct.c_int(dy), ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32)


def mc_prep_scaled(filter2d, src_win, w, h, mx, my, dx, dy, bitdepth):
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    tmp = np.zeros((h, w), np.int16)
    fn = getattr(lib(), "oracle_mc_prep_scaled" + _sfx(bitdepth))
    fn(ct.c_int(filter2d), _pp(tmp), _px_at(s, 3, 3),
       ct.c_ssize_t(s.shape[1] * s.dtype.itemsize),
       ct.c_int(w), ct.c_int(h), ct.c_int(mx), ct.c_int(my),
       ct.c_int(dx), ct.c_int(dy), ct.c_int((1 << bitdepth) - 1))
    return tmp.astype(np.int32)


def _comp(name, tmp1, tmp2, w, h, bitdepth, *extra):
    t1 = np.ascontiguousarray(tmp1.astype(np.int16))
    t2 = np.ascontiguousarray(tmp2.astype(np.int16))
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    esz = dst.dtype.itemsize
    fn = getattr(lib(), name + _sfx(bitdepth))
    fn(_pp(dst), ct.c_ssize_t(w * esz), _pp(t1), _pp(t2),
       ct.c_int(w), ct.c_int(h), *extra, ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32)


def avg(tmp1, tmp2, w, h, bitdepth):
    return _comp("oracle_avg", tmp1, tmp2, w, h, bitdepth)


def w_avg(tmp1, tmp2, w, h, weight, bitdepth):
    return _comp("oracle_w_avg", tmp1, tmp2, w, h, bitdepth,
                 ct.c_int(weight))


def mask(tmp1, tmp2, w, h, m, bitdepth):
    m8 = np.ascontiguousarray(m.astype(np.uint8))
    return _comp("oracle_mask", tmp1, tmp2, w, h, bitdepth, _pp(m8))


def w_mask(ss, tmp1, tmp2, w, h, sign, bitdepth):
    t1 = np.ascontiguousarray(tmp1.astype(np.int16))
    t2 = np.ascontiguousarray(tmp2.astype(np.int16))
    ss_hor = 1 if ss else 0
    ss_ver = 1 if ss == 2 else 0
    dst = np.zeros((h, w), _pix_dtype(bitdepth))
    mbuf = np.zeros((h >> ss_ver) * (w >> ss_hor), np.uint8)
    esz = dst.dtype.itemsize
    fn = getattr(lib(), "oracle_w_mask" + _sfx(bitdepth))
    fn(ct.c_int(ss), _pp(dst), ct.c_ssize_t(w * esz), _pp(t1), _pp(t2),
       ct.c_int(w), ct.c_int(h), _pp(mbuf), ct.c_int(sign),
       ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32), \
        mbuf.reshape(h >> ss_ver, w >> ss_hor).astype(np.int32)


def blend(dst, tmp, w, h, m, bitdepth):
    d = np.ascontiguousarray(dst.astype(_pix_dtype(bitdepth)))
    t = np.ascontiguousarray(tmp.astype(_pix_dtype(bitdepth)))
    m8 = np.ascontiguousarray(m.astype(np.uint8))
    fn = getattr(lib(), "oracle_blend" + _sfx(bitdepth))
    fn(_pp(d), ct.c_ssize_t(w * d.dtype.itemsize), _pp(t),
       ct.c_int(w), ct.c_int(h), _pp(m8))
    return d.astype(np.int32)


def blend_dir(name, dst, tmp, w, h, bitdepth):
    d = np.ascontiguousarray(dst.astype(_pix_dtype(bitdepth)))
    t = np.ascontiguousarray(tmp.astype(_pix_dtype(bitdepth)))
    fn = getattr(lib(), name + _sfx(bitdepth))
    fn(_pp(d), ct.c_ssize_t(w * d.dtype.itemsize), _pp(t),
       ct.c_int(w), ct.c_int(h))
    return d.astype(np.int32)


def warp8x8(src_win, abcd, mx, my, bitdepth):
    """src_win: (15, 15), nominal origin (3, 3)."""
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    dst = np.zeros((8, 8), _pix_dtype(bitdepth))
    ab = np.ascontiguousarray(np.asarray(abcd, np.int16))
    fn = getattr(lib(), "oracle_warp8x8" + _sfx(bitdepth))
    fn(_pp(dst), ct.c_ssize_t(8 * dst.dtype.itemsize), _px_at(s, 3, 3),
       ct.c_ssize_t(s.shape[1] * s.dtype.itemsize), _pp(ab),
       ct.c_int(mx), ct.c_int(my), ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32)


def warp8x8t(src_win, abcd, mx, my, bitdepth):
    s = np.ascontiguousarray(src_win.astype(_pix_dtype(bitdepth)))
    tmp = np.zeros((8, 8), np.int16)
    ab = np.ascontiguousarray(np.asarray(abcd, np.int16))
    fn = getattr(lib(), "oracle_warp8x8t" + _sfx(bitdepth))
    fn(_pp(tmp), ct.c_ssize_t(8), _px_at(s, 3, 3),
       ct.c_ssize_t(s.shape[1] * s.dtype.itemsize), _pp(ab),
       ct.c_int(mx), ct.c_int(my), ct.c_int((1 << bitdepth) - 1))
    return tmp.astype(np.int32)


def emu_edge(bw, bh, iw, ih, x, y, ref, bitdepth):
    r = np.ascontiguousarray(ref.astype(_pix_dtype(bitdepth)))
    dst = np.zeros((bh, bw), _pix_dtype(bitdepth))
    fn = getattr(lib(), "oracle_emu_edge" + _sfx(bitdepth))
    fn(ct.c_ssize_t(bw), ct.c_ssize_t(bh), ct.c_ssize_t(iw),
       ct.c_ssize_t(ih), ct.c_ssize_t(x), ct.c_ssize_t(y),
       _pp(dst), ct.c_ssize_t(bw * dst.dtype.itemsize),
       _pp(r), ct.c_ssize_t(r.shape[1] * r.dtype.itemsize))
    return dst.astype(np.int32)


def resize(src, dst_w, h, src_w, dx, mx0, bitdepth):
    s = np.ascontiguousarray(src.astype(_pix_dtype(bitdepth)))
    dst = np.zeros((h, dst_w), _pix_dtype(bitdepth))
    fn = getattr(lib(), "oracle_resize" + _sfx(bitdepth))
    fn(_pp(dst), ct.c_ssize_t(dst_w * dst.dtype.itemsize),
       _pp(s), ct.c_ssize_t(s.shape[1] * s.dtype.itemsize),
       ct.c_int(dst_w), ct.c_int(h), ct.c_int(src_w), ct.c_int(dx),
       ct.c_int(mx0), ct.c_int((1 << bitdepth) - 1))
    return dst.astype(np.int32)
