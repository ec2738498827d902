"""TPU (JAX) deblock vs the NumPy reference, on real decoded frames."""
import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host.lf import build_lf_arrays
from dav1d_mirror_tpu.ops.ref.loopfilter import calc_eih, apply_deblock
from dav1d_mirror_tpu.ops.loopfilter_tpu import deblock_plane_tpu
from dav1d_mirror_tpu.models.ref_decoder import (FrameBuffers,
                                                 recon_intra_frame)
from dav1d_mirror_tpu.models import ref_decoder as rd
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame, gen_ivf)

CONFIGS = [
    dict(w=128, h=96, q=120, lf=(32, 28, 24, 20, 0)),
    dict(w=64, h=64, q=60, lf=(63, 63, 63, 63, 7), txsw=True),
    dict(w=96, h=64, q=100, lf=(20, 25, 15, 10, 3), bitdepth=10),
    dict(w=128, h=128, q=100, lf=(40, 40, 30, 30, 1), sb128=1),
]


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_deblock_tpu_matches_ref(ci):
    import jax
    cfg = CONFIGS[ci]
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       sb128=cfg.get("sb128", 0))
    fhdr = make_key_frame_hdr(
        seq, qidx=cfg["q"],
        txfm_mode=h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST,
        loopfilter=cfg["lf"])
    tile, coder = gen_intra_frame(seq, fhdr, RandomPolicy(31 + ci))
    bufs = FrameBuffers(seq, fhdr)
    recon_intra_frame(seq, fhdr, [coder], bufs)

    lf = build_lf_arrays(seq, fhdr, [coder], bufs.width, bufs.height)
    e_lut, i_lut = calc_eih(fhdr.loopfilter_sharpness)
    bd = seq.bitdepth
    sb_step4 = 32 if seq.sb128 else 16

    # numpy reference
    ref_planes = [p.copy() for p in bufs.planes]
    apply_deblock(ref_planes[0], lf.edge_v_y, lf.edge_h_y, lf.lvl_y, 0, 1,
                  e_lut, i_lut, (4, 8, 16), bd, sb_step4)
    for pl in (0, 1):
        apply_deblock(ref_planes[1 + pl], lf.edge_v_uv, lf.edge_h_uv,
                      lf.lvl_uv, pl, pl, e_lut, i_lut, (4, 6), bd,
                      sb_step4 >> bufs.ss_ver)

    # TPU path
    e_lut_j = np.asarray(e_lut)
    i_lut_j = np.asarray(i_lut)

    def prep_lvls(lvl, ci_v, ci_h):
        lv = lvl[:, :, ci_v].astype(np.int32)
        lv_prev = np.zeros_like(lv)
        lv_prev[:, 1:] = lv[:, :-1]
        lh = lvl[:, :, ci_h].astype(np.int32)
        lh_prev = np.zeros_like(lh)
        lh_prev[1:, :] = lh[:-1, :]
        return lv, lv_prev, lh, lh_prev

    lv, lvp, lh_, lhp = prep_lvls(lf.lvl_y, 0, 1)
    got_y = np.asarray(deblock_plane_tpu(
        bufs.planes[0].astype(np.int32), lf.edge_v_y.astype(np.int32),
        lf.edge_h_y.astype(np.int32), lv, lvp, lh_, lhp, e_lut_j, i_lut_j,
        luma=True, bitdepth=bd, sb_step4=sb_step4))
    np.testing.assert_array_equal(got_y, ref_planes[0].astype(np.int32),
                                  err_msg=f"cfg{ci} luma")

    for pl in (0, 1):
        lv, lvp, lh_, lhp = prep_lvls(lf.lvl_uv, pl, pl)
        got = np.asarray(deblock_plane_tpu(
            bufs.planes[1 + pl].astype(np.int32),
            lf.edge_v_uv.astype(np.int32), lf.edge_h_uv.astype(np.int32),
            lv, lvp, lh_, lhp, e_lut_j, i_lut_j, luma=False, bitdepth=bd,
            sb_step4=sb_step4 >> bufs.ss_ver))
        np.testing.assert_array_equal(
            got, ref_planes[1 + pl].astype(np.int32),
            err_msg=f"cfg{ci} plane {pl + 1}")
