"""End-to-end: generated inter (KEY + INTER chain) streams decoded by our
decoder vs the reference decoder, pixel-exact.

Covers the single-ref inter path (NEWMV/NEARESTMV/NEARMV/GLOBALMV with
refmvs candidate derivation), compound (AVG), var-tx trees, inter tx types,
switchable interp filters, sub8x8 chroma MC, deblock/CDEF/LR on inter
frames, and reference-slot rotation."""
import subprocess

import numpy as np
import pytest

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host import obu as obu_mod
from dav1d_mirror_tpu.data.tables import (new_cdf_context, qcat_from_qidx,
                                          cdf_thread_update)
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                make_inter_frame_hdr,
                                                gen_intra_frame,
                                                gen_inter_frame, gen_ivf)

CONFIGS = [
    dict(),                                       # plain: largest-tx, 3 P
    dict(txsw=True),
    dict(lf=(32, 28, 20, 24, 2)),
    dict(swfilter=True, txsw=True),
    dict(hp=0),
    dict(w=128, h=96, txsw=True, lf=(20, 20, 15, 15, 0)),
    dict(w=72, h=36, txsw=True),                  # odd dims, sub8x8 paths
    dict(w=128, h=128, sb128=1, txsw=True),
    dict(q=20, txsw=True, swfilter=True, lf=(40, 40, 40, 40, 4)),
    dict(comp=True, txsw=True),                   # compound AVG
    dict(comp=True, swfilter=True, lf=(25, 25, 20, 20, 1)),
    dict(cdef=dict(damping=5, n_bits=2, y_strength=[9, 0, 63, 17],
                   uv_strength=[5, 12, 0, 33])),
    dict(rotate_refs=True, n_inter=4),
    dict(lr=(2, 3, 1), lf=(18, 18, 12, 12, 0), txsw=True),
    dict(bitdepth=10, lf=(20, 20, 15, 15, 1), txsw=True),
    dict(layout=h.PIXEL_LAYOUT_I444, txsw=True),
    dict(mono=1, txsw=True),
    dict(bitdepth=10, layout=h.PIXEL_LAYOUT_I444, comp=True),
    dict(fg=dict(seed=4321, num_y_points=3,
                 y_points=[(0, 40), (80, 90), (255, 20)], ar_coeff_lag=1,
                 ar_coeffs_y=[3, -7, 12, 5], scaling_shift=8,
                 overlap_flag=1)),
    dict(swmotion=True, txsw=True),                      # OBMC
    dict(swmotion=True, lf=(28, 28, 20, 20, 2)),
    dict(warp=True, txsw=True),                          # warped motion
    dict(warp=True, swfilter=True, lf=(20, 20, 15, 15, 0)),
    dict(w=128, h=96, warp=True, txsw=True),
    dict(comp=True, masked=1, txsw=True),                # wedge/seg compound
    dict(comp=True, masked=1, lf=(25, 25, 18, 18, 1)),
    dict(comp=True, masked=1, layout=h.PIXEL_LAYOUT_I444),
    dict(interintra=1, txsw=True),                       # inter-intra blend
    dict(comp=True, masked=1, interintra=1, txsw=True),
    dict(primary=True, txsw=True),                       # CDF inheritance
    dict(order_hint=1, txsw=True),
    dict(order_hint=1, comp=True, jnt=1, txsw=True),     # dist-wtd compound
    dict(order_hint=1, comp=True, skipmode=True, txsw=True),
    dict(order_hint=1, comp=True, jnt=1, skipmode=True, primary=True,
         txsw=True, lf=(22, 22, 16, 16, 1)),
    dict(order_hint=1, tmvs=True, txsw=True),            # temporal MVs
    dict(order_hint=1, tmvs=True, comp=True, skipmode=True, txsw=True),
    dict(order_hint=1, tmvs=True, comp=True, primary=True, n_inter=4,
         w=128, h=96, txsw=True, lf=(20, 20, 14, 14, 1)),
    dict(order_hint=1, shortref=True, txsw=True),        # spec 7.8 refs
    dict(order_hint=1, shortref=True, comp=True, n_inter=4),
    dict(scc=1, txsw=True),                              # palette on inter
    dict(sr=12, txsw=True),                              # super-res + scaled MC
    dict(sr=16, w=128, h=96, comp=True, lf=(24, 24, 16, 16, 1)),
    dict(switch=True, txsw=True),                 # SWITCH frame (obu.c:446)
    dict(switch=True, order_hint=1, n_inter=4, lf=(20, 20, 14, 14, 1)),
    dict(size_from_ref=True, txsw=True),      # frame_size_with_refs
    dict(size_from_ref=True, comp=True, lf=(24, 24, 16, 16, 1)),
    # explicit error-resilient chain with slot rotation + order hints
    # (exercises the ref_order_hint re-sync reads, obu.c:529-539)
    dict(er=True, order_hint=1, n_inter=4, txsw=True),
]


def build_stream(cfg, seed):
    w, hh = cfg.get("w", 64), cfg.get("h", 64)
    q = cfg.get("q", 100)
    n_inter = cfg.get("n_inter", 3)
    cdef = cfg.get("cdef")
    fg = cfg.get("fg")
    order_hint = cfg.get("order_hint", 0)
    tmvs = cfg.get("tmvs", False)
    seq = make_seq_hdr(w, hh, sb128=cfg.get("sb128", 0),
                       bitdepth=cfg.get("bitdepth", 8),
                       layout=cfg.get("layout", h.PIXEL_LAYOUT_I420),
                       monochrome=cfg.get("mono", 0),
                       cdef=1 if cdef else 0,
                       restoration=1 if cfg.get("lr") else 0,
                       warped_motion=1 if cfg.get("warp") else 0,
                       masked_compound=cfg.get("masked", 0),
                       inter_intra=cfg.get("interintra", 0),
                       order_hint=order_hint, jnt_comp=cfg.get("jnt", 0),
                       ref_frame_mvs=1 if tmvs else 0,
                       screen_content=cfg.get("scc", 0),
                       super_res=1 if cfg.get("sr") else 0)
    txm = h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST
    lf = cfg.get("lf", (0, 0, 0, 0, 0))
    sr = cfg.get("sr")
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=txm, loopfilter=lf,
                            cdef_params=cdef, superres_denom=sr)
    if cfg.get("lr"):
        kf.restoration_type = list(cfg["lr"])
        kf.restoration_unit_size = [6 + seq.sb128, 6 + seq.sb128]
    if fg:
        seq.film_grain_present = 1
        kf.film_grain_present = 1
        for k, v in fg.items():
            setattr(kf.film_grain_data, k, v)
    kf_cdf_in = new_cdf_context(qcat_from_qidx(kf.quant_yac))
    tile, coder = gen_intra_frame(seq, kf, RandomPolicy(seed),
                                  cdf=kf_cdf_in.copy())
    frames = [(kf, tile, None)]
    ref_hdrs = [kf] * 8
    ref_cdfs = [cdf_thread_update(kf_cdf_in, coder.cdf, True)] * 8
    ref_tmvs = [None] * 8
    ref_refpoc = [[0] * 7 for _ in range(8)]
    # ref plan for order-hint configs: pocs 4, 2, 3 across slots 1-3 so
    # both forward and backward references exist (skip-mode/jnt coverage)
    oh_plan = [(4, [0] * 7, 1, 0), (2, [0, 0, 0, 0, 1, 1, 1], 2, 4),
               (3, [0, 0, 0, 2, 1, 1, 1], 3, 0),
               (5, [2, 0, 3, 2, 1, 1, 1], 4, 2)]
    for i in range(n_inter):
        prim = None
        poc = 0
        if cfg.get("rotate_refs"):
            slot = 1 + (i % 2)
            refidx = [(1 + ((i + 1) % 2)) if i else 0] * 7
            refresh = 1 << slot
        elif order_hint or cfg.get("primary"):
            poc, refidx, slot, prim_idx = oh_plan[i % len(oh_plan)]
            refresh = 1 << slot
            if not order_hint:
                poc = 0
            if cfg.get("primary"):
                prim = prim_idx
        else:
            refidx, refresh = [0] * 7, 0xFF
        # SWITCH frame as the last of the chain (obu.c:446-511: implies
        # error-resilient + size-override + refresh-all, none coded)
        ft = h.SWITCH if (cfg.get("switch") and i == n_inter - 1) \
            else h.INTER
        fi = make_inter_frame_hdr(
            seq, qidx=q, txfm_mode=txm, loopfilter=lf,
            switchable_filter=cfg.get("swfilter", False),
            switchable_comp=cfg.get("comp", False),
            switchable_motion=cfg.get("swmotion", False),
            warp=cfg.get("warp", False),
            cdef_params=cdef, hp=cfg.get("hp", 1),
            refidx=refidx, refresh=refresh, frame_offset=poc,
            primary_ref=None if ft == h.SWITCH else prim,
            skip_mode=cfg.get("skipmode", False),
            use_ref_frame_mvs=tmvs, superres_denom=sr,
            frame_type=ft,
            error_resilient=1 if cfg.get("er") else None,
            size_from_ref=0 if (cfg.get("size_from_ref") and
                                ft == h.INTER) else None)
        if cfg.get("lr"):
            fi.restoration_type = list(cfg["lr"])
            fi.restoration_unit_size = [6 + seq.sb128, 6 + seq.sb128]
        if cfg.get("shortref"):
            # code only LAST/GOLDEN; derive the rest per spec 7.8 — the
            # decoder (ours and the oracle) must re-derive identically
            fi.frame_ref_short_signaling = 1
            fi.refidx = obu_mod.derive_short_refs(
                seq, fi.frame_offset,
                [rh.frame_offset for rh in ref_hdrs],
                fi.refidx[0], fi.refidx[3])
        if fg:
            fi.film_grain_present = 1
            for k, v in fg.items():
                setattr(fi.film_grain_data, k, v)
            fi.film_grain_data.seed = fg["seed"] + 11 * (i + 1)
        if fi.switchable_comp_refs and seq.order_hint:
            obu_mod.derive_skip_mode(seq, fi, ref_hdrs)
            fi.skip_mode_enabled &= fi.skip_mode_allowed
        ref_poc = [ref_hdrs[fi.refidx[k]].frame_offset for k in range(7)]
        if fi.primary_ref_frame != h.PRIMARY_REF_NONE:
            cdf_in = ref_cdfs[fi.refidx[fi.primary_ref_frame]]
        else:
            cdf_in = new_cdf_context(qcat_from_qidx(fi.quant_yac))
        temporal = ([ref_refpoc[fi.refidx[k]] for k in range(7)],
                    [ref_tmvs[fi.refidx[k]] for k in range(7)]) \
            if tmvs else None
        ref_scaled = [fi.width[0] != fi.width[1]] * 7 if sr else None
        tile, coder = gen_inter_frame(seq, fi, RandomPolicy(seed + 1 + i),
                                      cdf=cdf_in.copy(), ref_poc=ref_poc,
                                      temporal=temporal,
                                      ref_scaled=ref_scaled)
        frames.append((fi, tile, list(ref_hdrs)))
        coder.rf.save_tmvs_frame()
        out_cdf = cdf_thread_update(cdf_in, coder.cdf, False) \
            if fi.refresh_context else cdf_in
        for s in range(8):
            if (fi.refresh_frame_flags >> s) & 1:
                ref_hdrs[s] = fi
                ref_cdfs[s] = out_cdf
                ref_tmvs[s] = coder.rf.rp
                ref_refpoc[s] = ref_poc
    return seq, gen_ivf(seq, frames), 1 + n_inter


def oracle_decode_frames(oracle_bin, ivf, tmp_path, seq, n_frames):
    p = tmp_path / "t.ivf"
    o = tmp_path / "out.yuv"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "yuv",
                        "-o", str(o), "-q"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"oracle failed: {r.stderr}"
    dt = np.uint8 if seq.bitdepth == 8 else np.uint16
    raw = np.frombuffer(o.read_bytes(), dt)
    w, hgt = seq.max_width, seq.max_height
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    cw, ch = (w + ss_hor) >> ss_hor, (hgt + ss_ver) >> ss_ver
    fsz = w * hgt + (0 if seq.monochrome else 2 * cw * ch)
    assert len(raw) == fsz * n_frames
    out = []
    off = 0
    for _ in range(n_frames):
        planes = [raw[off:off + w * hgt].reshape(hgt, w)]
        off += w * hgt
        if not seq.monochrome:
            for _ in range(2):
                planes.append(raw[off:off + cw * ch].reshape(ch, cw))
                off += cw * ch
        out.append(planes)
    return out


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_e2e_inter_pixel_exact(ci, oracle_bin, tmp_path):
    cfg = CONFIGS[ci]
    seq, ivf, n_frames = build_stream(cfg, seed=31000 + 137 * ci)
    ref_frames = oracle_decode_frames(oracle_bin, ivf, tmp_path, seq,
                                      n_frames)
    got_frames = decode_ivf(ivf)
    assert len(got_frames) == n_frames
    for fi, (got, ref) in enumerate(zip(got_frames, ref_frames)):
        for pl, (g, r) in enumerate(zip(got, ref)):
            assert g.shape == r.shape, (fi, pl, g.shape, r.shape)
            if not np.array_equal(g, r):
                bad = np.argwhere(g.astype(np.int32) != r.astype(np.int32))
                y0, x0 = bad[0]
                raise AssertionError(
                    f"cfg{ci} frame {fi} plane {pl}: {len(bad)} mismatches, "
                    f"first at ({y0},{x0}): got {g[y0, x0]} "
                    f"want {r[y0, x0]}")
