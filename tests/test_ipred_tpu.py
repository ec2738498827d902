"""Wavefront device intra engine vs host reconstruction, bit-exact.

models/tpu_intra re-expresses dav1d's sequential intra reconstruction
(src/recon_tmpl.c:1195-1596) as a host-planned wave scan; these tests
check the device output equals the host reference recon (itself
oracle-verified) pixel for pixel across mode families, bit depths,
layouts, palette/filter-intra and multi-tile streams."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from dav1d_mirror_tpu.host import headers as h  # noqa: E402
from dav1d_mirror_tpu.host.demux import parse_ivf  # noqa: E402
from dav1d_mirror_tpu.host.ivf import split_obus  # noqa: E402
from dav1d_mirror_tpu.models import ref_decoder as rd  # noqa: E402
from dav1d_mirror_tpu.models.tpu_intra import (  # noqa: E402
    recon_intra_frame_tpu)
from test_e2e_intra import build_stream  # noqa: E402


def _ab_case(cfg, seed):
    import dav1d_mirror_tpu.api as api
    seq, fhdr, ivf = build_stream(cfg, seed)
    _, _, _, frames = parse_ivf(ivf)
    box = {}
    orig = rd.recon_frame

    def spy(s_, f_, coders, bufs, *a, **k):
        box.update(coders=coders, seq=s_, fhdr=f_)
        return orig(s_, f_, coders, bufs, *a, **k)

    rd.recon_frame = spy
    try:
        d = api.Decoder(api.Settings())
        for fr in frames:
            d.send_obus([o for _, o in split_obus(fr.data)])
        d.get_picture()
    finally:
        rd.recon_frame = orig
    coders, seq_, fhdr_ = box["coders"], box["seq"], box["fhdr"]
    assert all(b.intra for c in coders for b in c.blocks)
    bufs = rd.FrameBuffers(seq_, fhdr_)
    recon_intra_frame_tpu(seq_, fhdr_, coders, bufs)
    bufs_ref = rd.FrameBuffers(seq_, fhdr_)
    rd.recon_frame(seq_, fhdr_, coders, bufs_ref)
    for i, (a, b) in enumerate(zip(bufs.planes, bufs_ref.planes)):
        ssh = bufs.ss_hor if i else 0
        ssv = bufs.ss_ver if i else 0
        ph, pw = (coders[0].bh * 4) >> ssv, (coders[0].bw * 4) >> ssh
        assert np.array_equal(a[:ph, :pw], b[:ph, :pw]), \
            f"plane {i}: {(a[:ph, :pw] != b[:ph, :pw]).sum()} px differ"


FAST_CASES = [
    dict(w=64, h=64, q=100),                        # DC/dir mode mix
    dict(w=72, h=36, q=80, txsw=True),              # rect tx, odd dims
    dict(w=64, h=64, q=60, fi=1, txsw=True),        # filter intra
    dict(w=64, h=64, q=90, scc=1, txsw=True),       # palette
]
SLOW_CASES = [
    dict(w=64, h=64, q=0),                          # lossless / WHT
    dict(w=96, h=64, q=100, bitdepth=10),
    dict(w=64, h=64, q=100, layout=h.PIXEL_LAYOUT_I444),
    dict(w=64, h=64, q=90, layout=h.PIXEL_LAYOUT_I422, txsw=True),
    dict(w=64, h=64, q=100, mono=1),
    dict(w=64, h=64, q=120, bitdepth=12, txsw=True),
    dict(w=64, h=64, q=90, ief=1, txsw=True),       # edge filter/upsample
    dict(w=128, h=128, q=100, sb128=1),
    dict(w=192, h=128, q=60, txsw=True, fi=1, scc=1, ief=1),
    dict(w=68, h=52, q=90, txsw=True, ief=1),
]


@pytest.mark.parametrize("ci", range(len(FAST_CASES)))
def test_intra_wavefront_matches_host(ci):
    _ab_case(FAST_CASES[ci], seed=5 + ci)


@pytest.mark.parametrize("ci", [
    pytest.param(i, marks=pytest.mark.slow if i < 2
                 else pytest.mark.xslow)
    for i in range(len(SLOW_CASES))])
def test_intra_wavefront_matches_host_slow(ci):
    _ab_case(SLOW_CASES[ci], seed=11 + ci)


@pytest.mark.xslow
def test_intra_wavefront_multitile():
    from dav1d_mirror_tpu.testing.streamgen import (
        RandomPolicy, make_seq_hdr, make_key_frame_hdr, gen_frame_tiles,
        gen_ivf)
    from dav1d_mirror_tpu.data.tables import (new_cdf_context,
                                              qcat_from_qidx)
    import dav1d_mirror_tpu.api as api
    seq = make_seq_hdr(128, 128)
    kf = make_key_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                            tiles=(1, 1))
    cdf0 = new_cdf_context(qcat_from_qidx(100))
    tiles_p, _ = gen_frame_tiles(seq, kf, RandomPolicy(3), cdf=cdf0)
    ivf = gen_ivf(seq, [(kf, tiles_p, None)])
    _, _, _, frames = parse_ivf(ivf)
    box = {}
    orig = rd.recon_frame

    def spy(s_, f_, coders, bufs, *a, **k):
        box.update(coders=coders, seq=s_, fhdr=f_)
        return orig(s_, f_, coders, bufs, *a, **k)

    rd.recon_frame = spy
    try:
        d = api.Decoder(api.Settings())
        for fr in frames:
            d.send_obus([o for _, o in split_obus(fr.data)])
        d.get_picture()
    finally:
        rd.recon_frame = orig
    coders, seq_, fhdr_ = box["coders"], box["seq"], box["fhdr"]
    bufs = rd.FrameBuffers(seq_, fhdr_)
    recon_intra_frame_tpu(seq_, fhdr_, coders, bufs)
    bufs_ref = rd.FrameBuffers(seq_, fhdr_)
    rd.recon_frame(seq_, fhdr_, coders, bufs_ref)
    for i, (a, b) in enumerate(zip(bufs.planes, bufs_ref.planes)):
        ssh = bufs.ss_hor if i else 0
        ssv = bufs.ss_ver if i else 0
        ph, pw = (coders[0].bh * 4) >> ssv, (coders[0].bw * 4) >> ssh
        assert np.array_equal(a[:ph, :pw], b[:ph, :pw])
