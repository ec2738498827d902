"""End-to-end: generated intra streams decoded by our decoder vs the
reference decoder, pixel-exact."""
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame, gen_ivf)

CONFIGS = [
    dict(w=64, h=64, q=100),
    dict(w=64, h=64, q=20, txsw=True),
    dict(w=128, h=96, q=150),
    dict(w=72, h=36, q=80, txsw=True),
    dict(w=64, h=64, q=0),               # lossless / WHT
    dict(w=128, h=128, q=120, sb128=1),
    dict(w=96, h=64, q=100, bitdepth=10),
    dict(w=64, h=64, q=100, layout=h.PIXEL_LAYOUT_I444),
    dict(w=64, h=64, q=100, mono=1),
    dict(w=64, h=64, q=60, fi=1, txsw=True),
    dict(w=64, h=64, q=100, ief=1),      # intra edge filter
    dict(w=160, h=128, q=90, ief=1, txsw=True, bitdepth=10),
    # deblocking
    dict(w=64, h=64, q=100, lf=(32, 32, 24, 20, 0)),
    dict(w=128, h=96, q=150, lf=(63, 60, 63, 63, 7), txsw=True),
    dict(w=96, h=64, q=120, lf=(20, 25, 0, 0, 4), bitdepth=10),
    dict(w=64, h=64, q=80, lf=(15, 15, 10, 10, 2),
         layout=h.PIXEL_LAYOUT_I444),
    dict(w=128, h=128, q=100, lf=(40, 40, 30, 30, 1), sb128=1, txsw=True),
    dict(w=64, h=64, q=100, lf=(32, 32, 32, 32, 0), mono=1),
    # cdef
    dict(w=64, h=64, q=150, cdef=dict(damping=5, n_bits=2,
                                      y_strength=[9, 0, 63, 17],
                                      uv_strength=[5, 12, 0, 33])),
    dict(w=128, h=96, q=100, lf=(25, 25, 20, 20, 0),
         cdef=dict(damping=3, n_bits=1, y_strength=[4, 21],
                   uv_strength=[7, 0])),
    dict(w=96, h=64, q=120, bitdepth=10,
         cdef=dict(damping=6, n_bits=0, y_strength=[13], uv_strength=[6])),
    dict(w=128, h=128, q=100, sb128=1, txsw=True,
         cdef=dict(damping=4, n_bits=2, y_strength=[1, 5, 9, 13],
                   uv_strength=[2, 6, 10, 14])),
    dict(w=64, h=64, q=80, layout=h.PIXEL_LAYOUT_I444, lf=(10, 12, 8, 9, 3),
         cdef=dict(damping=5, n_bits=1, y_strength=[8, 0],
                   uv_strength=[4, 9])),
    # loop restoration
    dict(w=64, h=64, q=120, lr=(2, 2, 2)),            # wiener all planes
    dict(w=128, h=96, q=100, lr=(3, 3, 3)),           # sgrproj
    dict(w=192, h=128, q=150, lr=(1, 1, 1), lf=(20, 20, 15, 15, 2)),
    dict(w=128, h=128, q=100, lr=(1, 0, 3), sb128=1, txsw=True,
         cdef=dict(damping=4, n_bits=1, y_strength=[6, 11],
                   uv_strength=[3, 0])),
    dict(w=96, h=64, q=90, bitdepth=10, lr=(2, 3, 1),
         lf=(18, 18, 12, 12, 0)),
    dict(w=160, h=96, q=110, lr=(1, 1, 1), lr_us=(7, 6)),  # 128px units
    # film grain
    dict(w=64, h=64, q=100,
         fg=dict(seed=1234, num_y_points=3,
                 y_points=[(0, 40), (80, 90), (255, 20)],
                 ar_coeff_lag=1, ar_coeffs_y=[3, -7, 12, 5],
                 scaling_shift=8, overlap_flag=1)),
    dict(w=96, h=70, q=120, lf=(20, 20, 10, 10, 0),
         fg=dict(seed=9999, num_y_points=2, y_points=[(10, 60), (200, 80)],
                 num_uv_points=[2, 1],
                 uv_points=[[(0, 30), (255, 64)], [(0, 50)]],
                 ar_coeff_lag=2,
                 ar_coeffs_y=[1, -2, 3, -4, 5, -6, 7, -8, 9, -10, 11, -12],
                 ar_coeffs_uv=[[2] * 13, [-3] * 13],
                 uv_mult=[10, -20], uv_luma_mult=[40, 50],
                 uv_offset=[-5, 9],
                 scaling_shift=9, overlap_flag=1,
                 clip_to_restricted_range=1)),
    dict(w=64, h=64, q=100, bitdepth=10,
         fg=dict(seed=777, num_y_points=2, y_points=[(0, 64), (255, 64)],
                 chroma_scaling_from_luma=1, ar_coeff_lag=0,
                 scaling_shift=10, overlap_flag=0,
                 grain_scale_shift=1)),
    # palette (screen content tools)
    dict(w=64, h=64, q=100, scc=1, txsw=True),
    dict(w=96, h=64, q=120, scc=1, lf=(28, 28, 20, 20, 1), txsw=True),
    dict(w=64, h=64, q=100, scc=1, bitdepth=10, txsw=True),
    dict(w=64, h=64, q=90, scc=1, layout=h.PIXEL_LAYOUT_I444, txsw=True),
    # intra block copy
    dict(w=64, h=64, q=100, scc=1, intrabc=True, txsw=True),
    dict(w=128, h=96, q=120, scc=1, intrabc=True, txsw=True),
    dict(w=64, h=64, q=100, scc=1, intrabc=True, bitdepth=10, txsw=True),
    # super-resolution
    dict(w=64, h=64, q=100, sr=12, txsw=True),
    dict(w=96, h=64, q=100, sr=9, lf=(28, 28, 20, 20, 1)),
    dict(w=64, h=64, q=120, sr=16, lr=(2, 3, 1), lf=(18, 18, 12, 12, 0)),
    dict(w=64, h=64, q=100, sr=12, bitdepth=10, lr=(1, 1, 1)),
    dict(w=64, h=64, q=150, sr=13, txsw=True,
         cdef=dict(damping=5, n_bits=1, y_strength=[9, 0],
                   uv_strength=[5, 12])),
]


def build_stream(cfg, seed):
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       layout=cfg.get("layout", h.PIXEL_LAYOUT_I420),
                       sb128=cfg.get("sb128", 0),
                       filter_intra=cfg.get("fi", 0),
                       monochrome=cfg.get("mono", 0),
                       screen_content=cfg.get("scc", 0),
                       super_res=1 if cfg.get("sr") else 0)
    seq.intra_edge_filter = cfg.get("ief", 0)
    if cfg.get("cdef"):
        seq.cdef = 1
    if cfg.get("lr"):
        seq.restoration = 1
    fhdr = make_key_frame_hdr(
        seq, qidx=cfg["q"],
        txfm_mode=h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST,
        loopfilter=cfg.get("lf", (0, 0, 0, 0, 0)),
        cdef_params=cfg.get("cdef"),
        intrabc=cfg.get("intrabc", False),
        superres_denom=cfg.get("sr"))
    if cfg.get("lr"):
        fhdr.restoration_type = list(cfg["lr"])
        us = cfg.get("lr_us", (6 + seq.sb128, 6 + seq.sb128))
        fhdr.restoration_unit_size = list(us)
    if cfg.get("fg"):
        seq.film_grain_present = 1
        fhdr.film_grain_present = 1
        fgd = fhdr.film_grain_data
        for k, v in cfg["fg"].items():
            setattr(fgd, k, v)
    tile, _ = gen_intra_frame(seq, fhdr, RandomPolicy(seed))
    return seq, fhdr, gen_ivf(seq, [(fhdr, tile)])


def oracle_decode_yuv(oracle_bin, ivf, tmp_path, seq):
    p = tmp_path / "t.ivf"
    o = tmp_path / "out.yuv"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "yuv",
                        "-o", str(o), "-q"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, f"oracle failed: {r.stderr}"
    raw = o.read_bytes()
    dt = np.uint8 if seq.bitdepth == 8 else np.uint16
    arr = np.frombuffer(raw, dt)
    w, hgt = seq.max_width, seq.max_height
    planes = [arr[:w * hgt].reshape(hgt, w)]
    off = w * hgt
    if not seq.monochrome:
        ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
        ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
        cw = (w + ss_hor) >> ss_hor
        ch = (hgt + ss_ver) >> ss_ver
        for _ in range(2):
            planes.append(arr[off:off + cw * ch].reshape(ch, cw))
            off += cw * ch
    assert off == len(arr)
    return planes


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_e2e_intra_pixel_exact(ci, oracle_bin, tmp_path):
    cfg = CONFIGS[ci]
    seq, fhdr, ivf = build_stream(cfg, seed=777 + ci)
    ref_planes = oracle_decode_yuv(oracle_bin, ivf, tmp_path, seq)
    got_frames = decode_ivf(ivf)
    assert len(got_frames) == 1
    got = got_frames[0]
    assert len(got) == len(ref_planes)
    for pl, (g, r) in enumerate(zip(got, ref_planes)):
        assert g.shape == r.shape, (pl, g.shape, r.shape)
        if not np.array_equal(g, r):
            bad = np.argwhere(g.astype(np.int32) != r.astype(np.int32))
            y0, x0 = bad[0]
            raise AssertionError(
                f"cfg{ci} plane {pl}: {len(bad)} mismatches, first at "
                f"({y0},{x0}): got {g[y0, x0]} want {r[y0, x0]}")
