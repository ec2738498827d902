"""End-to-end: multi-tile streams (tile columns/rows) decoded vs the
reference decoder, pixel-exact.

Exercises per-tile entropy state (independent msac + CDF copies per tile),
deblocking across tile boundaries (tx_lpf fixup semantics), CDEF/LR with
tiles, and the update-tile CDF save. Tiles are the multi-chip shard axis of
the TPU design, so this is the correctness base for tile sharding."""
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.data.tables import (new_cdf_context, qcat_from_qidx,
                                          cdf_thread_update)
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                make_inter_frame_hdr,
                                                gen_frame_tiles, gen_ivf)

CONFIGS = [
    dict(tiles=(1, 0)),
    dict(w=128, h=128, tiles=(1, 1)),
    dict(tiles=(0, 1)),
    dict(tiles=(1, 0), lf=(28, 28, 20, 20, 1)),
    dict(w=128, h=128, tiles=(1, 1), lf=(35, 30, 25, 20, 2)),
    dict(tiles=(1, 0), comp=True),
    dict(tiles=(1, 0), lf=(20, 20, 15, 15, 0), lr=(2, 3, 1),
         cdef=dict(damping=5, n_bits=1, y_strength=[9, 0],
                   uv_strength=[5, 12])),
    dict(w=256, h=64, tiles=(2, 0), lf=(24, 24, 16, 16, 1)),
    dict(w=128, h=128, tiles=(1, 1), primary=True),
    dict(w=128, h=128, tiles=(1, 1), bitdepth=10, lf=(22, 22, 16, 16, 1)),
]


def build_stream(cfg, seed):
    w, hh = cfg.get("w", 128), cfg.get("h", 96)
    q = cfg.get("q", 100)
    tiles = cfg["tiles"]
    n_inter = cfg.get("n_inter", 2)
    lf = cfg.get("lf", (0, 0, 0, 0, 0))
    cdefp = cfg.get("cdef")
    lr = cfg.get("lr")
    seq = make_seq_hdr(w, hh, bitdepth=cfg.get("bitdepth", 8),
                       cdef=1 if cdefp else 0, restoration=1 if lr else 0)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                            loopfilter=lf, tiles=tiles, cdef_params=cdefp)
    if lr:
        kf.restoration_type = list(lr)
        kf.restoration_unit_size = [6, 6]
    cdf0 = new_cdf_context(qcat_from_qidx(q))
    tiles_p, coders = gen_frame_tiles(seq, kf, RandomPolicy(seed), cdf=cdf0)
    frames = [(kf, tiles_p, None)]
    ref_hdrs = [kf] * 8
    ref_cdfs = [cdf_thread_update(cdf0, coders[kf.tiling.update].cdf,
                                  True)] * 8
    for i in range(n_inter):
        fi = make_inter_frame_hdr(
            seq, qidx=q, txfm_mode=h.TX_SWITCHABLE, loopfilter=lf,
            tiles=tiles, switchable_comp=cfg.get("comp", False),
            cdef_params=cdefp,
            primary_ref=(0 if cfg.get("primary") else None))
        if lr:
            fi.restoration_type = list(lr)
            fi.restoration_unit_size = [6, 6]
        cdf_in = ref_cdfs[0] if cfg.get("primary") else \
            new_cdf_context(qcat_from_qidx(q))
        tiles_p, coders = gen_frame_tiles(seq, fi,
                                          RandomPolicy(seed + 1 + i),
                                          cdf=cdf_in, ref_poc=[0] * 7)
        frames.append((fi, tiles_p, list(ref_hdrs)))
        out_cdf = cdf_thread_update(cdf_in,
                                    coders[fi.tiling.update].cdf, False) \
            if fi.refresh_context else cdf_in
        ref_hdrs = [fi] * 8
        ref_cdfs = [out_cdf] * 8
    return seq, gen_ivf(seq, frames), 1 + n_inter


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_e2e_multitile_pixel_exact(ci, oracle_bin, tmp_path):
    cfg = CONFIGS[ci]
    seq, ivf, n_frames = build_stream(cfg, seed=61000 + 211 * ci)
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
    cw, ch = (w + 1) >> 1, (hgt + 1) >> 1
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
                y0, x0 = bad[0]
                raise AssertionError(
                    f"cfg{ci} frame {fi} plane {pl}: {len(bad)} mismatches,"
                    f" first at ({y0},{x0})")
