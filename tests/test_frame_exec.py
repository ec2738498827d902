"""The fused whole-frame program (models/frame_exec).

The interpreter (eager op replay) is exercised by every device-path test
on CPU; these tests force the JIT-COMPILED whole-frame trace
(DAV1D_TPU_FUSE=1 — the path real TPU decodes take) on the checked-in
corpus streams and require bit-identical md5s vs the reference hashes
(which the oracle produced). Stream selection covers every fused op
family: translational/hv puts + residuals (inter_basic), compound joins
(inter_compound_oh), warp + OBMC laps (inter_warp_obmc), wedge/seg
masks (inter_masked), scaled MC + super-res sres/snapshot replay
(inter_superres), Wiener/SGR lrw/lrs (inter_10bit_lr), grain + filters
(inter_grain), multi-tile packing (multitile_2x2), and the fused intra
engine (setplane/newres/resraw/intrascan/crop) on the intra streams."""
import os

import pytest

STREAMS = os.path.join(os.path.dirname(__file__), "streams")

FUSED_STREAMS = [
    "inter_basic", "inter_compound_oh", "inter_warp_obmc",
    "inter_masked", "inter_superres", "inter_10bit_lr", "inter_grain",
    "multitile_2x2",
]
INTRA_ENGINE_STREAMS = ["intra_filter_pal", "intra_sb128_lr"]


def _md5s():
    out = {}
    with open(os.path.join(STREAMS, "md5.txt")) as f:
        for line in f:
            digest, name = line.split()
            out[name] = digest
    return out


def _decode_md5(path, **settings):
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.output import MD5Muxer
    with open(path, "rb") as f:
        data = f.read()
    _, units = open_demuxer(data)
    dec = api.Decoder(api.Settings(use_tpu_inter=True,
                                   use_tpu_filters=True,
                                   apply_grain=False, **settings))
    mux = MD5Muxer()
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    return mux.digest()


@pytest.mark.xslow
@pytest.mark.parametrize("name", FUSED_STREAMS)
def test_fused_frame_program_bit_exact(name, monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_FUSE", "1")
    got = _decode_md5(os.path.join(STREAMS, f"{name}.ivf"))
    assert got == _md5s()[f"{name}.ivf"]


@pytest.mark.xslow
@pytest.mark.parametrize("name", INTRA_ENGINE_STREAMS)
def test_fused_intra_engine_bit_exact(name, monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_FUSE", "1")
    got = _decode_md5(os.path.join(STREAMS, f"{name}.ivf"),
                      use_tpu_intra_engine=True)
    assert got == _md5s()[f"{name}.ivf"]
