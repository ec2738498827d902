"""End-to-end: bit-depth/layout/coding-feature matrix vs the reference
decoder, pixel-exact: 12-bit, 4:2:2, dual filter, per-superblock delta-q/lf,
and non-identity global motion (translation/rot-zoom/affine, incl. global
warp reconstruction)."""
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                make_inter_frame_hdr,
                                                gen_intra_frame,
                                                gen_inter_frame, gen_ivf,
                                                make_random_gmv,
                                                set_delta_params)

T, R, A = (h.WM_TYPE_TRANSLATION, h.WM_TYPE_ROT_ZOOM, h.WM_TYPE_AFFINE)

CONFIGS = [
    dict(bitdepth=12, lf=(24, 24, 16, 16, 1)),
    dict(bitdepth=12, layout=h.PIXEL_LAYOUT_I444),
    dict(layout=h.PIXEL_LAYOUT_I422),
    dict(layout=h.PIXEL_LAYOUT_I422, bitdepth=10, lf=(20, 20, 14, 14, 0)),
    dict(layout=h.PIXEL_LAYOUT_I422, bitdepth=12),
    dict(dual=1, swfilter=True),
    dict(dq=2),
    dict(dq=1, dlf=1, lf=(28, 28, 20, 20, 1)),
    dict(dq=2, dlf=2, dlf_multi=1, lf=(30, 25, 20, 18, 2)),
    dict(gmv_types=[T] * 7),
    dict(gmv_types=[R, 0, 0, 0, 0, 0, 0]),
    dict(gmv_types=[A] * 3 + [0] * 4),
    dict(gmv_types=[R, T, A, 0, 0, 0, 0], warp=True),
]


def build_stream(cfg, seed):
    w, hh = cfg.get("w", 64), cfg.get("h", 64)
    q = cfg.get("q", 100)
    bitdepth = cfg.get("bitdepth", 8)
    layout = cfg.get("layout", h.PIXEL_LAYOUT_I420)
    lf = cfg.get("lf", (0, 0, 0, 0, 0))
    n_inter = cfg.get("n_inter", 2)
    seq = make_seq_hdr(w, hh, bitdepth=bitdepth, layout=layout,
                       dual_filter=cfg.get("dual", 0),
                       warped_motion=1 if cfg.get("warp") else 0)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                            loopfilter=lf)
    if cfg.get("dq") is not None:
        set_delta_params(kf, cfg["dq"], cfg.get("dlf"),
                         cfg.get("dlf_multi", 0))
    frames = [(kf, gen_intra_frame(seq, kf, RandomPolicy(seed))[0])]
    rng = np.random.default_rng(seed * 3 + 1)
    for i in range(n_inter):
        fi = make_inter_frame_hdr(
            seq, qidx=q, txfm_mode=h.TX_SWITCHABLE, loopfilter=lf,
            switchable_filter=cfg.get("swfilter", False),
            warp=cfg.get("warp", False))
        if cfg.get("dq") is not None:
            set_delta_params(fi, cfg["dq"], cfg.get("dlf"),
                             cfg.get("dlf_multi", 0))
        for ri, typ in enumerate(cfg.get("gmv_types") or []):
            if typ:
                fi.gmv[ri] = make_random_gmv(rng, typ, fi.hp)
        frames.append((fi, gen_inter_frame(seq, fi,
                                           RandomPolicy(seed + 1 + i))[0]))
    return seq, gen_ivf(seq, frames), 1 + n_inter


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_e2e_features_pixel_exact(ci, oracle_bin, tmp_path):
    cfg = CONFIGS[ci]
    seq, ivf, n_frames = build_stream(cfg, seed=71000 + 173 * ci)
    p = tmp_path / "t.ivf"
    o = tmp_path / "out.yuv"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "yuv",
                        "-o", str(o), "-q"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"oracle failed: {r.stderr}"
    dt = np.uint8 if seq.bitdepth == 8 else np.uint16
    raw = np.frombuffer(o.read_bytes(), dt)
    w, hgt = seq.max_width, seq.max_height
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    cw, ch = (w + ss_hor) >> ss_hor, (hgt + ss_ver) >> ss_ver
    fsz = w * hgt + 2 * cw * ch
    got = decode_ivf(ivf)
    assert len(got) == n_frames and len(raw) == fsz * n_frames
    off = 0
    for fi, planes in enumerate(got):
        ref = [raw[off:off + w * hgt].reshape(hgt, w)]
        off += w * hgt
        for _ in range(2):
            ref.append(raw[off:off + cw * ch].reshape(ch, cw))
            off += cw * ch
        for pl, (g, rr) in enumerate(zip(planes, ref)):
            if not np.array_equal(g, rr):
                bad = np.argwhere(g.astype(np.int32) != rr.astype(np.int32))
                raise AssertionError(
                    f"cfg{ci} frame {fi} plane {pl}: {len(bad)} mismatches")
