"""Header writer -> parser round-trip tests."""
import dataclasses

import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host.getbits import GetBits
from dav1d_mirror_tpu.host import obu
from dav1d_mirror_tpu.testing import obu_write as ow


def mk_seq(**kw):
    s = h.SequenceHeader()
    s.max_width, s.max_height = 64, 64
    s.width_n_bits = s.height_n_bits = 16
    for k, v in kw.items():
        setattr(s, k, v)
    return s


def mk_frame(seq, **kw):
    f = h.FrameHeader()
    f.frame_type = h.KEY
    f.show_frame = 1
    f.width = [seq.max_width, seq.max_width]
    f.height = seq.max_height
    f.render_width = seq.max_width
    f.render_height = seq.max_height
    f.error_resilient_mode = 1
    f.refresh_context = 0  # disable_cdf_update=0 -> bit written
    f.quant_yac = 100
    for k, v in kw.items():
        setattr(f, k, v)
    return f


SEQ_VARIANTS = [
    {},
    {"sb128": 1, "filter_intra": 1, "intra_edge_filter": 1},
    {"order_hint": 1, "order_hint_n_bits": 7, "jnt_comp": 1,
     "ref_frame_mvs": 1},
    {"cdef": 1, "restoration": 1, "super_res": 0},
    {"hbd": 1},
    {"monochrome": 1, "layout": h.PIXEL_LAYOUT_I400},
    {"screen_content_tools": h.ADAPTIVE, "force_integer_mv": h.ADAPTIVE},
    {"max_width": 1920, "max_height": 1080, "film_grain_present": 1},
]


@pytest.mark.parametrize("kw", SEQ_VARIANTS)
def test_seq_hdr_roundtrip(kw):
    s = mk_seq(**kw)
    payload = ow.write_seq_hdr(s)
    s2 = obu.parse_seq_hdr(GetBits(payload))
    assert dataclasses.asdict(s2) == dataclasses.asdict(s)


FRAME_VARIANTS = [
    {},
    {"quant_yac": 0, "txfm_mode": h.TX_4X4_ONLY,
     "loopfilter_mode_ref_delta_enabled": 1},
    {"quant_ydc_delta": -5, "quant_uac_delta": 3, "quant_vac_delta": 3},
    {"loopfilter_level_y": [15, 13], "loopfilter_level_u": 7,
     "loopfilter_level_v": 2, "loopfilter_sharpness": 4,
     "loopfilter_mode_ref_delta_enabled": 1},
    {"txfm_mode": h.TX_SWITCHABLE, "reduced_txtp_set": 1},
    {"delta_q_present": 1, "delta_q_res_log2": 2},
    {"show_frame": 0, "showable_frame": 1, "refresh_frame_flags": 0x3},
]


@pytest.mark.parametrize("kw", FRAME_VARIANTS)
def test_frame_hdr_roundtrip(kw):
    seq = mk_seq()
    f = mk_frame(seq, **kw)
    payload = ow.write_frame_hdr(f, seq, standalone=True)
    st = obu.ObuState(seq_hdr=seq, frame_hdr=h.FrameHeader())
    obu.parse_frame_hdr(st, GetBits(payload))
    got, want = dataclasses.asdict(st.frame_hdr), dataclasses.asdict(f)
    # derived fields the writer input doesn't carry
    for d in (got, want):
        for k in ("segmentation_qidx", "segmentation_lossless",
                  "all_lossless", "tiling", "seg_data",
                  "loopfilter_mode_ref_delta_update", "refresh_context"):
            d.pop(k)
    assert got == want


def test_cdef_lr_roundtrip():
    seq = mk_seq(cdef=1, restoration=1)
    f = mk_frame(seq)
    f.cdef_damping = 5
    f.cdef_n_bits = 2
    f.cdef_y_strength[:4] = [1, 9, 17, 33]
    f.cdef_uv_strength[:4] = [0, 4, 8, 12]
    f.restoration_type = [h.RESTORATION_WIENER, h.RESTORATION_NONE,
                          h.RESTORATION_SGRPROJ]
    f.restoration_unit_size = [7, 6]
    payload = ow.write_frame_hdr(f, seq, standalone=True)
    st = obu.ObuState(seq_hdr=seq, frame_hdr=h.FrameHeader())
    obu.parse_frame_hdr(st, GetBits(payload))
    g = st.frame_hdr
    assert g.cdef_damping == 5 and g.cdef_n_bits == 2
    assert g.cdef_y_strength[:4] == [1, 9, 17, 33]
    assert g.restoration_type == f.restoration_type
    assert g.restoration_unit_size == [7, 6]


def test_full_obu_stream():
    seq = mk_seq()
    f = mk_frame(seq)
    data = (ow.write_obu(h.OBU_TD, b"") +
            ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq)) +
            ow.write_obu(h.OBU_FRAME_HDR,
                         ow.write_frame_hdr(f, seq, standalone=True)) +
            ow.write_obu(h.OBU_TILE_GRP,
                         ow.write_tile_group(b"\x00" * 16)))
    st = obu.ObuState()
    pos = 0
    while pos < len(data):
        pos = obu.parse_obus(st, data[pos:]) + pos
    assert st.seq_hdr is not None
    assert st.frame_hdr is not None
    assert st.frame_ready
    assert len(st.tiles) == 1 and st.tiles[0].data == b"\x00" * 16
