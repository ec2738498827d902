"""Intra prediction: NumPy reference vs reference decoder C kernels."""
import numpy as np
import pytest

import oracle_dsp
from dav1d_mirror_tpu.ops.ref import ipred as ip

pytestmark = pytest.mark.skipif(not oracle_dsp.have_oracle(),
                                reason="oracle dsp lib not built")

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
         (16, 4), (4, 16), (8, 32), (64, 16), (16, 64)]

SIMPLE_MODES = [ip.DC_PRED, ip.VERT_PRED, ip.HOR_PRED, ip.LEFT_DC_PRED,
                ip.TOP_DC_PRED, ip.DC_128_PRED, ip.SMOOTH_PRED,
                ip.SMOOTH_V_PRED, ip.SMOOTH_H_PRED, ip.PAETH_PRED]


def rand_topleft(rng, bitdepth, n=257):
    return rng.integers(0, 1 << bitdepth, size=n).astype(
        np.uint8 if bitdepth == 8 else np.uint16)


@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("mode", SIMPLE_MODES)
def test_simple_modes(mode, bitdepth):
    rng = np.random.default_rng(mode * 7 + bitdepth)
    for (w, h) in SIZES:
        tl = rand_topleft(rng, bitdepth)
        ref = oracle_dsp.intra_pred(mode, tl, w, h, 0, w, h, bitdepth)
        got = ip.intra_pred_ref(mode, tl, 128, w, h, 0, w, h, bitdepth)
        np.testing.assert_array_equal(got, ref.astype(np.int32),
                                      err_msg=f"mode={mode} {w}x{h}")


@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("mode", [ip.Z1_PRED, ip.Z2_PRED, ip.Z3_PRED])
def test_z_modes(mode, bitdepth):
    rng = np.random.default_rng(mode + bitdepth)
    # base angles per mode with angle deltas +-3*2 and flags
    for (w, h) in SIZES:
        if max(w, h) > 32 and mode != ip.Z1_PRED:
            pass  # still legal; keep
        for base in {ip.Z1_PRED: (45, 67, 81),
                     ip.Z2_PRED: (113, 135, 157),
                     ip.Z3_PRED: (203, 225, 247)}[mode]:
            for delta in (-9, -3, 0, 3, 9):
                angle = base + delta
                if mode == ip.Z1_PRED and not (0 < angle < 90):
                    continue
                if mode == ip.Z2_PRED and not (90 < angle < 180):
                    continue
                if mode == ip.Z3_PRED and not (180 < angle < 270):
                    continue
                for is_sm in (0, 1):
                    for eief in (0, 1):
                        packed = angle | (is_sm << 9) | (eief << 10)
                        tl = rand_topleft(rng, bitdepth)
                        ref = oracle_dsp.intra_pred(mode, tl, w, h, packed,
                                                    w, h, bitdepth)
                        got = ip.intra_pred_ref(mode, tl, 128, w, h, packed,
                                                w, h, bitdepth)
                        np.testing.assert_array_equal(
                            got, ref.astype(np.int32),
                            err_msg=f"m={mode} {w}x{h} a={angle} "
                                    f"sm={is_sm} eief={eief}")


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_filter_mode(bitdepth):
    rng = np.random.default_rng(44)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 32), (8, 4), (4, 16),
                   (32, 16)]:
        if w > 32 or h > 32:
            continue
        for filt in range(5):
            tl = rand_topleft(rng, bitdepth)
            ref = oracle_dsp.intra_pred(ip.FILTER_PRED, tl, w, h, filt,
                                        w, h, bitdepth)
            got = ip.intra_pred_ref(ip.FILTER_PRED, tl, 128, w, h, filt,
                                    w, h, bitdepth)
            np.testing.assert_array_equal(got, ref.astype(np.int32),
                                          err_msg=f"filt={filt} {w}x{h}")


@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("layout", [1, 2, 3])  # 420, 422, 444
def test_cfl_ac(layout, bitdepth):
    rng = np.random.default_rng(layout)
    ss_hor = 1 if layout != 3 else 0
    ss_ver = 1 if layout == 1 else 0
    for (cw, ch) in [(4, 4), (8, 8), (16, 16), (4, 8), (16, 4), (8, 32)]:
        for w_pad, h_pad in [(0, 0), (1, 0), (0, 1)]:
            if w_pad * 4 >= cw or h_pad * 4 >= ch:
                continue
            ypx = rng.integers(0, 1 << bitdepth,
                               size=(ch << ss_ver, cw << ss_hor)).astype(
                np.uint8 if bitdepth == 8 else np.uint16)
            ref = oracle_dsp.cfl_ac(layout, ypx, w_pad, h_pad, cw, ch,
                                    bitdepth)
            got = ip.cfl_ac_ref(ypx, w_pad, h_pad, cw, ch, ss_hor, ss_ver)
            np.testing.assert_array_equal(got, ref.astype(np.int32),
                                          err_msg=f"{cw}x{ch} {layout}")


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_cfl_pred(bitdepth):
    rng = np.random.default_rng(9)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 32), (8, 16)]:
        for mode in (0, 3, 4, 5):
            for alpha in (-16, -3, 1, 7, 16):
                tl = rand_topleft(rng, bitdepth)
                ac = rng.integers(-(1 << (bitdepth + 2)),
                                  1 << (bitdepth + 2),
                                  size=(h, w)).astype(np.int16)
                ref = oracle_dsp.cfl_pred(mode, tl, w, h, ac, alpha,
                                          bitdepth)
                dc = ip.dc_value(tl.astype(np.int32), 128, w, h, mode,
                                 bitdepth)
                got = ip.cfl_pred_ref(dc, ac, alpha, w, h, bitdepth)
                np.testing.assert_array_equal(got, ref.astype(np.int32),
                                              err_msg=f"{w}x{h} m={mode} "
                                                      f"a={alpha}")


def test_pal_pred():
    rng = np.random.default_rng(5)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (64, 64), (8, 4)]:
        pal = rng.integers(0, 256, size=8).astype(np.uint8)
        idx = rng.integers(0, 8, size=(h, w)).astype(np.uint8)
        ref = oracle_dsp.pal_pred(pal, idx, w, h, 8)
        got = ip.pal_pred_ref(pal, idx, w, h)
        np.testing.assert_array_equal(got, ref.astype(np.int32))
