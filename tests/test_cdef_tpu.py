"""TPU CDEF vs NumPy reference on real decoded frames."""
import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host.tilecoder import T_BLOCK_DIM
from dav1d_mirror_tpu.ops.ref.cdef import apply_cdef_frame
from dav1d_mirror_tpu.ops.cdef_tpu import cdef_frame_tpu
from dav1d_mirror_tpu.models.ref_decoder import (FrameBuffers,
                                                 recon_intra_frame)
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame)

CONFIGS = [
    dict(w=128, h=96, q=150, cdef=dict(damping=5, n_bits=2,
                                       y_strength=[9, 0, 63, 17],
                                       uv_strength=[5, 12, 0, 33])),
    dict(w=64, h=64, q=100, cdef=dict(damping=3, n_bits=1,
                                      y_strength=[4, 21],
                                      uv_strength=[7, 0])),
    dict(w=96, h=64, q=120, bitdepth=10,
         cdef=dict(damping=6, n_bits=0, y_strength=[13], uv_strength=[6])),
    dict(w=64, h=64, q=80, layout=h.PIXEL_LAYOUT_I444,
         cdef=dict(damping=5, n_bits=1, y_strength=[8, 0],
                   uv_strength=[4, 9])),
]


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_cdef_tpu_matches_ref(ci):
    cfg = CONFIGS[ci]
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       layout=cfg.get("layout", h.PIXEL_LAYOUT_I420))
    seq.cdef = 1
    fhdr = make_key_frame_hdr(seq, qidx=cfg["q"], cdef_params=cfg["cdef"])
    tile, coder = gen_intra_frame(seq, fhdr, RandomPolicy(51 + ci))
    bufs = FrameBuffers(seq, fhdr)
    recon_intra_frame(seq, fhdr, [coder], bufs)

    bw4, bh4 = coder.bw, coder.bh
    n64x, n64y = (bw4 + 15) >> 4, (bh4 + 15) >> 4
    cdef_idx_map = np.full((n64y, n64x), -1, np.int32)
    for (bx, by, idxs) in coder.cdef_idx:
        cdef_idx_map[by >> 4, bx >> 4] = idxs[0]
    noskip = np.zeros((bh4, bw4), bool)
    for b in coder.blocks:
        if not b.skip:
            bd_ = T_BLOCK_DIM[b.bs]
            noskip[b.by:b.by + int(bd_[1]), b.bx:b.bx + int(bd_[0])] = True

    ref_planes = [p.copy() for p in bufs.planes]
    apply_cdef_frame(ref_planes, seq, fhdr, cdef_idx_map, noskip, bw4, bh4,
                     bufs.ss_hor, bufs.ss_ver)

    got = cdef_frame_tpu(
        tuple(jnp_arr.astype(np.int32) for jnp_arr in bufs.planes),
        cdef_idx_map, noskip,
        np.asarray(fhdr.cdef_y_strength, np.int32),
        np.asarray(fhdr.cdef_uv_strength, np.int32),
        fhdr.cdef_damping + seq.bitdepth - 8, seq.bitdepth,
        bufs.ss_hor, bufs.ss_ver, seq.layout == h.PIXEL_LAYOUT_I400)
    for pl in range(3):
        g = np.asarray(got[pl])
        r = ref_planes[pl].astype(np.int32)
        # TPU filters only the full-block region; compare there
        hb = g.shape[0] // (8 >> (bufs.ss_ver if pl else 0)) * \
            (8 >> (bufs.ss_ver if pl else 0))
        np.testing.assert_array_equal(g, r, err_msg=f"cfg{ci} plane {pl}")
