"""Tile coder round-trip + reference-decoder conformance of generated
streams."""
import os
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host.msac import Msac
from dav1d_mirror_tpu.host.tilecoder import TileCoder, DecodeSide
from dav1d_mirror_tpu.data.tables import new_cdf_context, qcat_from_qidx
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame, gen_ivf)

CONFIGS = [
    dict(w=64, h=64, q=100),
    dict(w=64, h=64, q=20, txsw=True),
    dict(w=128, h=96, q=150),           # non-SB-multiple height
    dict(w=72, h=36, q=80, txsw=True),  # odd-ish frame size
    dict(w=64, h=64, q=0),              # lossless (WHT)
    dict(w=128, h=128, q=120, sb128=1),
    dict(w=96, h=64, q=100, bitdepth=10),
    dict(w=64, h=64, q=100, layout=h.PIXEL_LAYOUT_I444),
    dict(w=64, h=64, q=100, mono=1),
    dict(w=64, h=64, q=60, fi=1, txsw=True),  # filter intra
]


def build(cfg, seed=0):
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       layout=cfg.get("layout", h.PIXEL_LAYOUT_I420),
                       sb128=cfg.get("sb128", 0),
                       filter_intra=cfg.get("fi", 0),
                       monochrome=cfg.get("mono", 0))
    fhdr = make_key_frame_hdr(
        seq, qidx=cfg["q"],
        txfm_mode=h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST)
    tile, coder = gen_intra_frame(seq, fhdr, RandomPolicy(seed))
    return seq, fhdr, tile, coder


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_tilecoder_roundtrip(ci):
    cfg = CONFIGS[ci]
    seq, fhdr, tile, enc_coder = build(cfg, seed=ci)

    cdf = new_cdf_context(qcat_from_qidx(fhdr.quant_yac))
    msac = Msac(tile, disable_cdf_update=bool(fhdr.disable_cdf_update))
    dec = TileCoder(seq, fhdr, cdf, DecodeSide(msac))
    dec.code_tile()

    assert len(enc_coder.blocks) > 0, "generator produced no blocks"
    assert len(dec.blocks) == len(enc_coder.blocks)
    for be, bd in zip(enc_coder.blocks, dec.blocks):
        for f in ("bx", "by", "bs", "bl", "bp", "skip", "y_mode", "y_angle",
                  "uv_mode", "uv_angle", "tx", "uvtx", "seg_id", "qidx"):
            assert getattr(be, f) == getattr(bd, f), \
                f"block@{be.bx},{be.by} field {f}"
        assert be.cfl_alpha == bd.cfl_alpha
    assert len(dec.coefs) == len(enc_coder.coefs)
    for ce, cd in zip(enc_coder.coefs, dec.coefs):
        assert (ce.plane, ce.x, ce.y, ce.tx, ce.txtp, ce.eob) == \
            (cd.plane, cd.x, cd.y, cd.tx, cd.txtp, cd.eob)
        if ce.eob >= 0:
            np.testing.assert_array_equal(ce.cf, cd.cf)


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_generated_stream_oracle_decodes(ci, oracle_bin, tmp_path):
    cfg = CONFIGS[ci]
    seq, fhdr, tile, _ = build(cfg, seed=100 + ci)
    ivf = gen_ivf(seq, [(fhdr, tile)])
    p = tmp_path / "t.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "-o", "-", "-q"],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, f"oracle rejected stream: {r.stderr}"
    md5 = r.stdout.strip()
    assert len(md5.split()[0]) == 32
