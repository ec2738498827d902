"""CDEF kernels: NumPy reference vs reference decoder C kernels."""
import ctypes as ct

import numpy as np
import pytest

import oracle_dsp
from dav1d_mirror_tpu.ops.ref import cdef as cd

pytestmark = pytest.mark.skipif(not oracle_dsp.have_oracle(),
                                reason="oracle dsp lib not built")


def oracle_dir(img, bitdepth):
    L = oracle_dsp.lib()
    fn = getattr(L, "oracle_cdef_dir" + ("_8bpc" if bitdepth == 8
                                         else "_16bpc"))
    buf = np.ascontiguousarray(img)
    var = ct.c_uint(0)
    d = fn(buf.ctypes.data_as(ct.c_void_p),
           ct.c_ssize_t(buf.shape[1] * buf.dtype.itemsize),
           ct.byref(var), ct.c_int((1 << bitdepth) - 1))
    return d, var.value


def oracle_fb(layout_idx, canvas, w, h, pri, sec, dir_, damping, edges,
              bitdepth):
    """canvas: (h+4, w+4) neighbourhood; block at (2, 2). The C kernel walks
    top/bottom rows with the dst stride, so everything must live in one
    buffer (as in the real decoder). Returns the filtered canvas."""
    L = oracle_dsp.lib()
    fn = getattr(L, "oracle_cdef_fb" + ("_8bpc" if bitdepth == 8
                                        else "_16bpc"))
    buf = np.ascontiguousarray(canvas.copy())
    esz = buf.dtype.itemsize
    stride = buf.shape[1] * esz
    left = np.ascontiguousarray(canvas[2:2 + h, 0:2].copy())
    dst_ptr = ct.c_void_p(buf.ctypes.data + 2 * stride + 2 * esz)
    top_ptr = ct.c_void_p(buf.ctypes.data + 0 * stride + 2 * esz)
    bot_ptr = ct.c_void_p(buf.ctypes.data + (2 + h) * stride + 2 * esz)
    fn(ct.c_int(layout_idx), dst_ptr, ct.c_ssize_t(stride),
       left.ctypes.data_as(ct.c_void_p), top_ptr, bot_ptr, ct.c_int(pri),
       ct.c_int(sec), ct.c_int(dir_), ct.c_int(damping), ct.c_int(edges),
       ct.c_int((1 << bitdepth) - 1))
    return buf[2:2 + h, 2:2 + w]


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_cdef_dir(bitdepth):
    rng = np.random.default_rng(3)
    dt = np.uint8 if bitdepth == 8 else np.uint16
    for _ in range(50):
        img = rng.integers(0, 1 << bitdepth, size=(8, 8)).astype(dt)
        rd, rv = oracle_dir(img, bitdepth)
        gd, gv = cd.cdef_find_dir(img, bitdepth)
        assert (rd, rv) == (gd, gv)


@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("layout_idx,w,h", [(0, 8, 8), (1, 4, 8), (2, 4, 4)])
def test_cdef_filter(layout_idx, w, h, bitdepth):
    rng = np.random.default_rng(layout_idx * 10 + bitdepth)
    dt = np.uint8 if bitdepth == 8 else np.uint16
    bd_m8 = bitdepth - 8
    for pri_base in (0, 1, 4, 15):
        for sec_base in (0, 1, 2, 4):
            if not pri_base and not sec_base:
                continue
            pri = pri_base << bd_m8
            sec = sec_base << bd_m8
            for dir_ in range(8):
                for edges in (15, 0, 5, 10, 3, 12):
                    # build a (h+4, w+4) neighbourhood
                    canvas = rng.integers(0, 1 << bitdepth,
                                          size=(h + 4, w + 4)).astype(dt)
                    damping = 5 + bd_m8
                    ref = oracle_fb(layout_idx, canvas, w, h, pri, sec,
                                    dir_, damping, edges, bitdepth)
                    # numpy path: full-plane formulation
                    src = canvas.astype(np.int32)
                    dstp = src.copy()
                    cd.cdef_filter_block(dstp, src, 2, 2, w, h, pri, sec,
                                         dir_, damping, edges, bitdepth)
                    got = dstp[2:2 + h, 2:2 + w]
                    np.testing.assert_array_equal(
                        got, ref.astype(np.int32),
                        err_msg=f"pri={pri} sec={sec} dir={dir_} "
                                f"edges={edges} {w}x{h}")
