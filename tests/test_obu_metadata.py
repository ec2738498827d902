"""Metadata OBUs (HDR CLL/MDCV, ITU-T T.35) and operating-point layer
filtering — parse parity with dav1d obu.c:1400-1546 and :1246-1254."""
import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.testing import obu_write as ow
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame)


def _stream_with_metadata():
    seq = make_seq_hdr(64, 64)
    kf = make_key_frame_hdr(seq, qidx=100)
    tile, _ = gen_intra_frame(seq, kf, RandomPolicy(3))
    obus = (
        ow.write_obu(h.OBU_TD, b"") +
        ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq)) +
        ow.write_obu(h.OBU_METADATA, ow.write_metadata_cll(1000, 400)) +
        ow.write_obu(h.OBU_METADATA, ow.write_metadata_mdcv(
            [(35400, 14599), (8500, 39850), (6550, 2300)],
            (15635, 16450), 10000000, 50)) +
        ow.write_obu(h.OBU_METADATA,
                     ow.write_metadata_t35(0xB5, b"\x00\x3Chello")) +
        ow.write_obu(h.OBU_FRAME_HDR,
                     ow.write_frame_hdr(kf, seq, standalone=True)) +
        ow.write_obu(h.OBU_TILE_GRP,
                     ow.write_tile_group(tile,
                                         n_bytes=kf.tiling.n_bytes or 4)))
    return seq, ow.write_ivf([obus], 64, 64)


def test_metadata_props_surface_on_picture():
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.host.demux import open_demuxer

    _, ivf = _stream_with_metadata()
    dec = api.Decoder(api.Settings())
    _, units = open_demuxer(ivf)
    pics = []
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    assert len(pics) == 1
    p = pics[0]
    assert p.content_light == (1000, 400)
    assert p.mastering_display["white_point"] == (15635, 16450)
    assert p.mastering_display["max_luminance"] == 10000000
    assert p.mastering_display["min_luminance"] == 50
    assert len(p.itut_t35) == 1
    assert p.itut_t35[0]["country_code"] == 0xB5
    assert p.itut_t35[0]["payload"] == b"\x00\x3Chello"


def test_metadata_stream_decodes_identically(oracle_bin, tmp_path):
    """Metadata OBUs must not perturb decoding (oracle md5 match)."""
    import subprocess
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    _, ivf = _stream_with_metadata()
    p = tmp_path / "m.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "-o", "-"], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    dec = api.Decoder(api.Settings())
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    assert mux.digest() == r.stdout.strip()


def test_obu_frame_combined_type(oracle_bin, tmp_path):
    """OBU_FRAME (header + byte-aligned tile group in one OBU,
    obu.c:1683-1708) decodes identically in ours and the oracle."""
    import subprocess
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    seq = make_seq_hdr(64, 64)
    kf = make_key_frame_hdr(seq, qidx=90, txfm_mode=h.TX_SWITCHABLE)
    tile, _ = gen_intra_frame(seq, kf, RandomPolicy(8))
    frame_payload = (
        ow.write_frame_hdr(kf, seq, standalone=False) +
        ow.write_tile_group(tile, n_bytes=kf.tiling.n_bytes or 4))
    obus = (ow.write_obu(h.OBU_TD, b"") +
            ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq)) +
            ow.write_obu(h.OBU_FRAME, frame_payload))
    ivf = ow.write_ivf([obus], 64, 64)

    p = tmp_path / "f.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "-o", "-"], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr

    dec = api.Decoder(api.Settings())
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    for u in units:
        dec.send_obus(u)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    assert mux.digest() == r.stdout.strip()
