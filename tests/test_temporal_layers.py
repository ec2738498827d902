"""Temporal scalability: extension OBUs + operating-point selection
(dav1d obu.c:1246-1254, lib.c oppoint handling) verified end-to-end
against the reference decoder for both operating points."""
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host import obu as obu_mod
from dav1d_mirror_tpu.data.tables import (new_cdf_context, qcat_from_qidx,
                                          cdf_thread_update)
from dav1d_mirror_tpu.testing import obu_write as ow
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                make_inter_frame_hdr,
                                                gen_intra_frame,
                                                gen_inter_frame)


def _layered_stream(seed=51):
    """KEY(t0) + P(t0) + P(t1) + P(t0): two operating points, op0 = all
    layers (idc temporal bits 0b11), op1 = base layer only (0b01)."""
    seq = make_seq_hdr(64, 64)
    seq.num_operating_points = 2
    op_all, op_base = seq.operating_points[0], type(
        seq.operating_points[0])()
    op_all.idc = (1 << 8) | 0b11
    op_base.idc = (1 << 8) | 0b01
    for o in (op_base,):
        o.major_level = op_all.major_level
        o.minor_level = op_all.minor_level
        o.tier = op_all.tier
    seq.operating_points = [op_all, op_base]

    kf = make_key_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE)
    cdf_in = new_cdf_context(qcat_from_qidx(kf.quant_yac))
    tile0, coder0 = gen_intra_frame(seq, kf, RandomPolicy(seed),
                                    cdf=cdf_in.copy())
    ref_cdf = cdf_thread_update(cdf_in, coder0.cdf, True)

    frames = [(kf, tile0, 0)]
    # base-layer P referencing the keyframe, refreshing slot 1
    f1 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[0] * 7, refresh=1 << 1)
    t1, c1 = gen_inter_frame(seq, f1, RandomPolicy(seed + 1),
                             cdf=cdf_in.copy(), ref_poc=[0] * 7)
    frames.append((f1, t1, 0))
    # enhancement-layer P (temporal_id 1), refreshing nothing
    f2 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[1] * 7, refresh=0)
    t2, _ = gen_inter_frame(seq, f2, RandomPolicy(seed + 2),
                            cdf=cdf_in.copy(), ref_poc=[0] * 7)
    frames.append((f2, t2, 1))
    # base-layer P again (must not depend on the t1 frame)
    f3 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[1] * 7, refresh=1 << 2)
    t3, _ = gen_inter_frame(seq, f3, RandomPolicy(seed + 3),
                            cdf=cdf_in.copy(), ref_poc=[0] * 7)
    frames.append((f3, t3, 0))

    units = []
    for i, (fh, tile, tid) in enumerate(frames):
        obus = ow.write_obu(h.OBU_TD, b"")
        if i == 0:
            obus += ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq))
        obus += ow.write_obu(
            h.OBU_FRAME_HDR,
            ow.write_frame_hdr(fh, seq, standalone=True),
            temporal_id=tid)
        obus += ow.write_obu(
            h.OBU_TILE_GRP,
            ow.write_tile_group(tile, n_bytes=fh.tiling.n_bytes or 4),
            temporal_id=tid)
        units.append(obus)
    return ow.write_ivf(units, 64, 64)


@pytest.mark.parametrize("oppoint,n_expected", [(0, 4), (1, 3)])
def test_operating_point_selection(oppoint, n_expected, oracle_bin,
                                   tmp_path):
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    ivf = _layered_stream()
    p = tmp_path / "t.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "--oppoint", str(oppoint), "-o", "-"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    dec = api.Decoder(api.Settings(operating_point=oppoint, logger=None))
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    n = 0
    for u in units:
        dec.send_obus(u)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
            n += 1
    assert n == n_expected
    assert mux.digest() == r.stdout.strip()


def _spatial_layered_stream(seed=61):
    """Per temporal unit: one sid-0 frame + one sid-1 frame (same size);
    the operating point spans both spatial layers."""
    seq = make_seq_hdr(64, 64)
    op = seq.operating_points[0]
    op.idc = (0b11 << 8) | 0b1
    kf = make_key_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE)
    cdf_in = new_cdf_context(qcat_from_qidx(kf.quant_yac))
    tile0, _ = gen_intra_frame(seq, kf, RandomPolicy(seed),
                               cdf=cdf_in.copy())
    # sid-1 enhancement frame in the same TU (references the keyframe)
    f1 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[0] * 7, refresh=1 << 1)
    t1, _ = gen_inter_frame(seq, f1, RandomPolicy(seed + 1),
                            cdf=cdf_in.copy(), ref_poc=[0] * 7)
    # second TU: sid0 + sid1 inter frames
    f2 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[0] * 7, refresh=1 << 2)
    t2, _ = gen_inter_frame(seq, f2, RandomPolicy(seed + 2),
                            cdf=cdf_in.copy(), ref_poc=[0] * 7)
    f3 = make_inter_frame_hdr(seq, qidx=100, txfm_mode=h.TX_SWITCHABLE,
                              refidx=[1] * 7, refresh=1 << 3)
    t3, _ = gen_inter_frame(seq, f3, RandomPolicy(seed + 3),
                            cdf=cdf_in.copy(), ref_poc=[0] * 7)

    tus = [[(kf, tile0, 0, 0), (f1, t1, 0, 1)],
           [(f2, t2, 0, 0), (f3, t3, 0, 1)]]
    units = []
    first = True
    for tu in tus:
        obus = ow.write_obu(h.OBU_TD, b"")
        for fh, tile, tid, sid in tu:
            if first:
                obus += ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq))
                first = False
            obus += ow.write_obu(
                h.OBU_FRAME_HDR,
                ow.write_frame_hdr(fh, seq, standalone=True),
                temporal_id=tid, spatial_id=sid)
            obus += ow.write_obu(
                h.OBU_TILE_GRP,
                ow.write_tile_group(tile, n_bytes=fh.tiling.n_bytes or 4),
                temporal_id=tid, spatial_id=sid)
        units.append(obus)
    return ow.write_ivf(units, 64, 64)


@pytest.mark.parametrize("all_layers,n_expected", [(1, 4), (0, 2)])
def test_spatial_all_layers(all_layers, n_expected, oracle_bin, tmp_path):
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    ivf = _spatial_layered_stream()
    p = tmp_path / "s.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "--alllayers", str(all_layers), "-o", "-"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    dec = api.Decoder(api.Settings(all_layers=bool(all_layers),
                                   logger=None))
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    n = 0
    for u in units:
        dec.send_obus(u)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
            n += 1
    dec.drain()
    while (pic := dec.get_picture()) is not None:
        mux.write(pic)
        n += 1
    assert n == n_expected
    assert mux.digest() == r.stdout.strip()
