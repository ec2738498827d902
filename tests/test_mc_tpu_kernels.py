"""Device MC kernel equivalence vs the NumPy reference (itself
oracle-verified): warp8x8(t), w_mask, OBMC blends, scaled put/prep,
super-res resize. dav1d src/mc_tmpl.c:620-957 surface."""
import numpy as np
import pytest
import jax.numpy as jnp

from dav1d_mirror_tpu.ops import mc_tpu as mt
from dav1d_mirror_tpu.ops.ref import mc as mcdsp


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("prep", [False, True])
def test_warp8x8_batch(bd, prep):
    rng = np.random.default_rng(3 + bd)
    H, W = 64, 80
    ref = rng.integers(0, 1 << bd, (2, H, W)).astype(np.int32)
    B = 12
    args = np.zeros((B, 10), np.int32)
    exp = []
    for i in range(B):
        r = rng.integers(0, 2)
        dx, dy = rng.integers(-8, W, 2)
        mx, my = rng.integers(0, 0x4000, 2)
        abcd = rng.integers(-512, 512, 4)
        args[i] = [r, dy - 3, dx - 3, mx, my, *abcd, 0]
        src = mcdsp.emu_edge(15, 15, W, H, dx - 3, dy - 3, ref[r])
        fn = mcdsp.warp8x8t if prep else mcdsp.warp8x8
        exp.append(fn(src, abcd, mx, my, bd))
    got = np.asarray(mt.warp8x8_batch(jnp.asarray(ref),
                                      jnp.asarray(args), bd, prep))
    assert np.array_equal(got, np.stack(exp))


@pytest.mark.slow
@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("ss", [(0, 0), (1, 0), (1, 1)])
def test_w_mask_batch(bd, ss):
    ssh, ssv = ss
    rng = np.random.default_rng(5)
    B, hh, w = 5, 16, 32
    lim = 1 << (bd + 4)
    t1 = rng.integers(-lim, lim, (B, hh, w)).astype(np.int32)
    t2 = rng.integers(-lim, lim, (B, hh, w)).astype(np.int32)
    sg = rng.integers(0, 2, B).astype(np.int32)
    gd, gm = mt.w_mask_batch(jnp.asarray(t1), jnp.asarray(t2),
                             jnp.asarray(sg), ssh, ssv, bd)
    gd, gm = np.asarray(gd), np.asarray(gm)
    for i in range(B):
        ed, em = mcdsp.w_mask(t1[i], t2[i], w, hh, int(sg[i]), ssh, ssv,
                              bd)
        assert np.array_equal(gd[i], ed)
        assert np.array_equal(gm[i], em)


@pytest.mark.slow
@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("vert", [False, True])
def test_obmc_blend_batch(bd, vert):
    rng = np.random.default_rng(7)
    B, oh, ow = 6, 8, 16
    plane = jnp.asarray(rng.integers(0, 1 << bd, (64, 64)).astype(
        np.int32))
    laps = rng.integers(0, 1 << bd, (B, oh, ow)).astype(np.int32)
    ys = np.arange(B, dtype=np.int32) * 8
    xs = np.full(B, 16, np.int32)
    out = np.asarray(mt.obmc_blend_batch(
        plane, jnp.asarray(laps), jnp.asarray(ys), jnp.asarray(xs), oh,
        ow, ow if vert else oh, vert))
    pl = np.asarray(plane)
    for i in range(B):
        reg = pl[ys[i]:ys[i] + oh, xs[i]:xs[i] + ow]
        fn = mcdsp.blend_v if vert else mcdsp.blend_h
        exp = fn(reg, laps[i], ow, oh)
        assert np.array_equal(out[ys[i]:ys[i] + oh, xs[i]:xs[i] + ow],
                              exp)


@pytest.mark.slow
@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("prep", [False, True])
def test_mc_scaled_batch(bd, prep):
    rng = np.random.default_rng(11)
    uw = uh = 8
    H, W = 50, 60
    ref = rng.integers(0, 1 << bd, (1, H, W)).astype(np.int32)
    B = 8
    args = np.zeros((B, 9), np.int32)
    exp = []
    for i in range(B):
        sx = rng.integers(1 << 14, 2 << 14)
        sy = rng.integers(1 << 14, 2 << 14)
        dx, dy = (sx + 8) >> 4, (sy + 8) >> 4
        pos_x = rng.integers(0, (W - 20) << 10)
        pos_y = rng.integers(0, (H - 20) << 10)
        top, left = pos_y >> 10, pos_x >> 10
        f2d = rng.integers(0, 9)
        args[i] = [0, top, left, pos_x & 0x3FF, pos_y & 0x3FF, dx, dy,
                   f2d, 0]
        right = ((pos_x + (uw - 1) * dx) >> 10) + 1
        bottom = ((pos_y + (uh - 1) * dy) >> 10) + 1
        src = mcdsp.emu_edge(right - left + 7, bottom - top + 7, W, H,
                             left - 3, top - 3, ref[0])
        fn = mcdsp.prep_8tap_scaled if prep else mcdsp.put_8tap_scaled
        exp.append(fn(src, uw, uh, pos_x & 0x3FF, pos_y & 0x3FF, dx, dy,
                      f2d, bd))
    got = np.asarray(mt.mc_scaled_batch(
        jnp.asarray(ref), jnp.asarray(args), uw, uh, 2 * uw + 10,
        2 * uh + 10, bd, prep))
    assert np.array_equal(got, np.stack(exp))


@pytest.mark.parametrize("bd", [8, 10])
def test_resize_plane_tpu(bd):
    rng = np.random.default_rng(13)
    h, src_w, out_w = 24, 48, 64
    src = rng.integers(0, 1 << bd, (h, src_w + 8)).astype(np.int32)
    step = ((src_w << 14) + (out_w >> 1)) // out_w
    mx0 = 137
    got = np.asarray(mt.resize_plane_tpu(jnp.asarray(src), out_w, src_w,
                                         step, mx0, bd))
    exp = mcdsp.resize(src, out_w, h, src_w, step, mx0, bd)
    assert np.array_equal(got, exp)
