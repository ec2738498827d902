"""Full device in-loop filter chain (deblock -> CDEF -> LR) vs the NumPy
reference pipeline, pixel-exact on real decoded frames."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.models.ref_decoder import (FrameBuffers,
                                                 recon_intra_frame,
                                                 apply_inloop_filters)
from dav1d_mirror_tpu.models.tpu_filters import apply_inloop_filters_tpu
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame)

CONFIGS = [
    # wiener all planes + deblock
    dict(w=128, h=96, q=120, lr=(2, 2, 2), lf=(30, 30, 24, 20, 0)),
    # sgrproj (mix kind) + cdef
    dict(w=128, h=96, q=100, lr=(3, 3, 3),
         cdef=dict(damping=4, n_bits=1, y_strength=[6, 11],
                   uv_strength=[3, 0])),
    # switchable, sb128, everything on
    dict(w=128, h=128, q=100, lr=(1, 1, 1), sb128=1, txsw=True,
         lf=(25, 25, 20, 20, 2),
         cdef=dict(damping=5, n_bits=2, y_strength=[9, 0, 63, 17],
                   uv_strength=[5, 12, 0, 33])),
    # 10-bit mixed types + 128px units
    dict(w=160, h=96, q=110, bitdepth=10, lr=(1, 3, 2), lr_us=(7, 6),
         lf=(18, 18, 12, 12, 0)),
    # 4:4:4
    dict(w=96, h=64, q=90, lr=(2, 3, 3), layout=h.PIXEL_LAYOUT_I444,
         lf=(10, 12, 8, 9, 3)),
]


def build(cfg, seed):
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       layout=cfg.get("layout", h.PIXEL_LAYOUT_I420),
                       sb128=cfg.get("sb128", 0))
    if cfg.get("cdef"):
        seq.cdef = 1
    seq.restoration = 1
    fhdr = make_key_frame_hdr(
        seq, qidx=cfg["q"],
        txfm_mode=h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST,
        loopfilter=cfg.get("lf", (0, 0, 0, 0, 0)),
        cdef_params=cfg.get("cdef"))
    fhdr.restoration_type = list(cfg["lr"])
    us = cfg.get("lr_us", (6 + seq.sb128, 6 + seq.sb128))
    fhdr.restoration_unit_size = list(us)
    tile, coder = gen_intra_frame(seq, fhdr, RandomPolicy(seed))
    return seq, fhdr, coder


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_tpu_filter_chain_matches_ref(ci):
    cfg = CONFIGS[ci]
    seq, fhdr, coder = build(cfg, 91 + ci)

    bufs_ref = FrameBuffers(seq, fhdr)
    recon_intra_frame(seq, fhdr, [coder], bufs_ref)
    bufs_tpu = FrameBuffers(seq, fhdr)
    for i, p in enumerate(bufs_ref.planes):
        bufs_tpu.planes[i][...] = p

    apply_inloop_filters(seq, fhdr, [coder], bufs_ref)
    apply_inloop_filters_tpu(seq, fhdr, [coder], bufs_tpu)

    for i, (a, b) in enumerate(zip(bufs_ref.planes, bufs_tpu.planes)):
        np.testing.assert_array_equal(b, a, err_msg=f"cfg{ci} plane {i}")
