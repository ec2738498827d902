"""MC NumPy reference vs the reference C kernels (oracle shim)."""
import numpy as np
import pytest

import oracle_dsp as od
from dav1d_mirror_tpu.ops.ref import mc

pytestmark = pytest.mark.skipif(not od.have_oracle(),
                                reason="oracle shim not built")

BDS = (8, 10, 12)


def _src(rng, h, w, bd):
    return rng.integers(0, 1 << bd, (h, w)).astype(np.int32)


def _tmp(rng, h, w, bd):
    # valid "prep" domain values: generate via prep of random pixels
    ib = mc._ibits(bd)
    px = rng.integers(0, 1 << bd, (h, w)).astype(np.int64)
    return ((px << ib) - mc._prep_bias(bd)).astype(np.int32)


@pytest.mark.parametrize("bd", BDS)
def test_put_prep_8tap(bd):
    rng = np.random.default_rng(bd)
    for w, h in ((2, 2), (4, 4), (4, 8), (8, 8), (8, 4), (16, 16), (32, 8),
                 (64, 64), (128, 32)):
        for f2d in (0, 1, 2, 3, 4, 5, 6, 7, 8):
            for mx, my in ((0, 0), (1, 0), (0, 15), (8, 8), (15, 1), (7, 9)):
                win = _src(rng, h + 7, w + 7, bd)
                got = mc.put_8tap(win, w, h, mx, my, f2d, bd)
                ref = od.mc_put(f2d, win, w, h, mx, my, bd)
                np.testing.assert_array_equal(
                    got, ref, err_msg=f"put {w}x{h} f{f2d} mx{mx} my{my}")
                gott = mc.prep_8tap(win, w, h, mx, my, f2d, bd)
                reft = od.mc_prep(f2d, win, w, h, mx, my, bd)
                np.testing.assert_array_equal(
                    gott, reft, err_msg=f"prep {w}x{h} f{f2d} mx{mx} my{my}")


@pytest.mark.parametrize("bd", BDS)
def test_put_prep_bilin(bd):
    rng = np.random.default_rng(bd + 100)
    for w, h in ((2, 2), (4, 4), (8, 16), (16, 8), (32, 32)):
        for mx, my in ((0, 0), (5, 0), (0, 11), (8, 8), (15, 15)):
            win = _src(rng, h + 7, w + 7, bd)
            got = mc.put_bilin(win[3:, 3:], w, h, mx, my, bd)
            ref = od.mc_put(9, win, w, h, mx, my, bd)
            np.testing.assert_array_equal(
                got, ref, err_msg=f"bilin put {w}x{h} {mx},{my}")
            gott = mc.prep_bilin(win[3:, 3:], w, h, mx, my, bd)
            reft = od.mc_prep(9, win, w, h, mx, my, bd)
            np.testing.assert_array_equal(
                gott, reft, err_msg=f"bilin prep {w}x{h} {mx},{my}")


@pytest.mark.parametrize("bd", BDS)
def test_put_prep_8tap_scaled(bd):
    rng = np.random.default_rng(bd + 200)
    for w, h in ((4, 4), (8, 8), (16, 16), (32, 16)):
        for f2d in (0, 5, 7):
            for mx, my, dx, dy in ((0, 0, 1024, 1024),
                                   (512, 256, 2048, 1536),
                                   (1023, 1023, 512, 512),
                                   (64, 960, 3072, 4096)):
                tmp_h = (((h - 1) * dy + my) >> 10) + 8
                max_ioff = ((mx + (w - 1) * dx) >> 10) + 8
                win = _src(rng, tmp_h + 1, max_ioff + 8, bd)
                got = mc.put_8tap_scaled(win, w, h, mx, my, dx, dy, f2d, bd)
                ref = od.mc_put_scaled(f2d, win, w, h, mx, my, dx, dy, bd)
                np.testing.assert_array_equal(
                    got, ref,
                    err_msg=f"put_scaled {w}x{h} f{f2d} {mx},{my},{dx},{dy}")
                gott = mc.prep_8tap_scaled(win, w, h, mx, my, dx, dy, f2d,
                                           bd)
                reft = od.mc_prep_scaled(f2d, win, w, h, mx, my, dx, dy, bd)
                np.testing.assert_array_equal(
                    gott, reft,
                    err_msg=f"prep_scaled {w}x{h} f{f2d} {mx},{my}")


@pytest.mark.parametrize("bd", BDS)
def test_compound(bd):
    rng = np.random.default_rng(bd + 300)
    for w, h in ((4, 4), (8, 16), (32, 32), (64, 16)):
        t1 = _tmp(rng, h, w, bd)
        t2 = _tmp(rng, h, w, bd)
        np.testing.assert_array_equal(mc.avg(t1, t2, bd),
                                      od.avg(t1, t2, w, h, bd))
        for wt in (1, 7, 12, 15):
            np.testing.assert_array_equal(mc.w_avg(t1, t2, wt, bd),
                                          od.w_avg(t1, t2, w, h, wt, bd))
        m = rng.integers(0, 65, (h, w)).astype(np.int32)
        np.testing.assert_array_equal(mc.mask(t1, t2, m, bd),
                                      od.mask(t1, t2, w, h, m, bd))


@pytest.mark.parametrize("bd", BDS)
def test_w_mask(bd):
    rng = np.random.default_rng(bd + 400)
    for w, h in ((8, 8), (16, 8), (32, 32), (64, 16)):
        t1 = _tmp(rng, h, w, bd)
        t2 = _tmp(rng, h, w, bd)
        for ss, ss_hor, ss_ver in ((0, 0, 0), (1, 1, 0), (2, 1, 1)):
            for sign in (0, 1):
                gd, gm = mc.w_mask(t1, t2, w, h, sign, ss_hor, ss_ver, bd)
                rd, rm = od.w_mask(ss, t1, t2, w, h, sign, bd)
                np.testing.assert_array_equal(
                    gd, rd, err_msg=f"w_mask px {w}x{h} ss{ss} s{sign}")
                np.testing.assert_array_equal(
                    gm, rm, err_msg=f"w_mask mask {w}x{h} ss{ss} s{sign}")


@pytest.mark.parametrize("bd", BDS)
def test_blend(bd):
    rng = np.random.default_rng(bd + 500)
    for w, h in ((4, 4), (8, 16), (16, 16), (32, 8)):
        dst = _src(rng, h, w, bd)
        tmp = _src(rng, h, w, bd)
        m = rng.integers(0, 65, (h, w)).astype(np.int32)
        np.testing.assert_array_equal(mc.blend(dst, tmp, m),
                                      od.blend(dst, tmp, w, h, m, bd))
        np.testing.assert_array_equal(
            mc.blend_v(dst, tmp, w, h),
            od.blend_dir("oracle_blend_v", dst, tmp, w, h, bd))
        np.testing.assert_array_equal(
            mc.blend_h(dst, tmp, w, h),
            od.blend_dir("oracle_blend_h", dst, tmp, w, h, bd))


@pytest.mark.parametrize("bd", BDS)
def test_warp(bd):
    rng = np.random.default_rng(bd + 600)
    for _ in range(8):
        win = _src(rng, 15, 15, bd)
        abcd = rng.integers(-512, 512, 4).astype(np.int16)
        mx = int(rng.integers(-4096, 4096))
        my = int(rng.integers(-4096, 4096))
        np.testing.assert_array_equal(mc.warp8x8(win, abcd, mx, my, bd),
                                      od.warp8x8(win, abcd, mx, my, bd))
        np.testing.assert_array_equal(mc.warp8x8t(win, abcd, mx, my, bd),
                                      od.warp8x8t(win, abcd, mx, my, bd))


@pytest.mark.parametrize("bd", (8, 10))
def test_emu_edge(bd):
    rng = np.random.default_rng(bd + 700)
    iw, ih = 40, 28
    ref = _src(rng, ih, iw, bd)
    for bw, bh, x, y in ((8, 8, -5, -5), (16, 8, 35, 20), (8, 16, -20, 40),
                         (32, 32, -10, -31), (64, 64, 100, 100),
                         (8, 8, 10, 10)):
        np.testing.assert_array_equal(
            mc.emu_edge(bw, bh, iw, ih, x, y, ref),
            od.emu_edge(bw, bh, iw, ih, x, y, ref, bd),
            err_msg=f"emu {bw}x{bh}@{x},{y}")


@pytest.mark.parametrize("bd", BDS)
def test_resize(bd):
    rng = np.random.default_rng(bd + 800)
    for src_w, dst_w in ((64, 32), (100, 64), (48, 40)):
        h = 8
        dx = int((src_w << 14) / dst_w + 0.5)
        mx0 = ((((src_w << 14) + (dst_w >> 1)) // dst_w - (1 << 14) + 1)
               >> 1) - 3 * (1 << 14) // 2  # arbitrary-ish valid offset
        mx0 = max(0, mx0) & 0x3FFF
        src = _src(rng, h, src_w, bd)
        np.testing.assert_array_equal(
            mc.resize(src, dst_w, h, src_w, dx, mx0, bd),
            od.resize(src, dst_w, h, src_w, dx, mx0, bd),
            err_msg=f"resize {src_w}->{dst_w}")
