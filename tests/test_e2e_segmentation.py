"""End-to-end: segmentation (fresh/inherited/temporal-predicted maps,
all feature types incl. ref/skip/globalmv) vs the reference decoder."""
import subprocess

import numpy as np
import pytest
from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.data.tables import new_cdf_context, qcat_from_qidx, cdf_thread_update
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
    make_key_frame_hdr, make_inter_frame_hdr, gen_intra_frame,
    gen_inter_frame, gen_ivf, set_segmentation)

SEGS_Q = [dict(delta_q=-40), dict(delta_q=30), dict(delta_q=0), None,
          dict(delta_q=60, delta_lf_y_v=12, delta_lf_y_h=-8, delta_lf_u=6,
               delta_lf_v=-6)]
SEGS_FEAT = [dict(delta_q=-20), dict(skip=1), dict(ref=2), dict(globalmv=1),
             dict(ref=0)]

def _run(oracle_bin, tmp_path, tag, seed, w=64, hh=64, q=100, n_inter=2, lf=(0,0,0,0,0),
        segs=SEGS_Q, inter_mode="fresh", temporal=0):
    # inter_mode: fresh (PRIMARY_REF_NONE, update all), inherit (update_data=0),
    # nomap (update_map=0), temporal
    seq = make_seq_hdr(w, hh)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE, loopfilter=lf)
    set_segmentation(kf, segs)
    cdf0 = new_cdf_context(qcat_from_qidx(q))
    tile, coder = gen_intra_frame(seq, kf, RandomPolicy(seed), cdf=cdf0.copy())
    frames = [(kf, tile, None)]
    ref_cdfs = cdf_thread_update(cdf0, coder.cdf, True)
    ref_hdr = kf
    prev_segmap = coder.seg_map.copy()
    for i in range(n_inter):
        primary = None if inter_mode == "fresh" else 0
        fi = make_inter_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                                  loopfilter=lf, primary_ref=primary)
        if inter_mode == "fresh":
            set_segmentation(fi, segs)
        elif inter_mode == "inherit":
            set_segmentation(fi, None, update_map=1, temporal=0,
                             update_data=0, inherit_from=ref_hdr)
        elif inter_mode == "nomap":
            set_segmentation(fi, None, update_map=0, temporal=0,
                             update_data=0, inherit_from=ref_hdr)
        elif inter_mode == "temporal":
            set_segmentation(fi, segs, update_map=1, temporal=1,
                             update_data=1)
        cdf_in = ref_cdfs if primary is not None else \
            new_cdf_context(qcat_from_qidx(q))
        tile, coder = gen_inter_frame(seq, fi, RandomPolicy(seed+1+i),
                                      cdf=cdf_in.copy(), ref_poc=[0]*7,
                                      prev_segmap=prev_segmap)
        frames.append((fi, tile, [ref_hdr]*8))
        ref_cdfs = cdf_thread_update(cdf_in, coder.cdf, False) \
            if fi.refresh_context else cdf_in
        ref_hdr = fi
        if fi.segmentation_update_map:
            prev_segmap = coder.seg_map.copy()
    ivf = gen_ivf(seq, frames)
    p = tmp_path / "t.ivf"
    o = tmp_path / "o.yuv"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "yuv",
                        "-o", str(o), "-q"], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0 and "Error" not in r.stderr, (tag, r.stderr)
    raw = np.frombuffer(o.read_bytes(), np.uint8)
    cw, ch = (w+1)//2, (hh+1)//2
    got = decode_ivf(ivf)
    assert len(raw) == (w*hh+2*cw*ch)*len(got), (len(raw), len(got))
    off = 0
    for fi_, planes in enumerate(got):
        ref = [raw[off:off+w*hh].reshape(hh,w)]; off += w*hh
        for _ in range(2):
            ref.append(raw[off:off+cw*ch].reshape(ch,cw)); off += cw*ch
        for pl,(g,rr) in enumerate(zip(planes, ref)):
            if not np.array_equal(g, rr):
                bad = np.argwhere(g.astype(int)!=rr.astype(int))
                raise AssertionError(f"{tag}: frame{fi_} plane{pl}: {len(bad)} bad")
    return True


CASES = [
    ("seg-intra", 8001, dict(n_inter=0)),
    ("seg-intra-lf", 8002, dict(n_inter=0, lf=(30, 30, 22, 22, 1))),
    ("seg-fresh", 8003, dict()),
    ("seg-feat", 8004, dict(segs=SEGS_FEAT)),
    ("seg-inherit", 8005, dict(inter_mode="inherit")),
    ("seg-nomap", 8006, dict(inter_mode="nomap")),
    ("seg-temporal", 8007, dict(inter_mode="temporal")),
    ("seg-temporal-feat", 8008, dict(segs=SEGS_FEAT, inter_mode="temporal")),
]


@pytest.mark.parametrize("ci", range(len(CASES)))
def test_e2e_segmentation_pixel_exact(ci, oracle_bin, tmp_path):
    tag, seed, kw = CASES[ci]
    assert _run(oracle_bin, tmp_path, tag, seed, **kw)
