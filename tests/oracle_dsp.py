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
