"""Conformant AV1 test-stream generator (intra frames).

Drives the mirrored TileCoder in encode mode with a random policy: every
symbol choice is syntactically valid, contexts/CDFs evolve exactly as in the
decoder, and the resulting IVF stream is decodable by any conformant decoder
— verified in tests against the reference decoder binary.
"""
from __future__ import annotations

import numpy as np

from ..host import headers as h
from ..host.tilecoder import TileCoder, EncodeSide
from ..data.tables import new_cdf_context, qcat_from_qidx
from .ec import MsacEncoder
from . import obu_write as ow


class RandomPolicy:
    """policy(key, maxv) -> value in [0, maxv] with decode-plausible
    distributions (small coefficients common, skip mixed, etc.)."""

    def __init__(self, seed=0, skip_p=0.4, eob_small=True):
        self.rng = np.random.default_rng(seed)
        self.skip_p = skip_p
        self.eob_small = eob_small

    def __call__(self, key, maxv):
        r = self.rng
        if key == "skip":
            return int(r.random() < self.skip_p)
        if key == "is_inter":
            return int(r.random() < 0.85)  # 1 = inter block
        if key == "mv_class":
            return int(min(r.geometric(0.5) - 1, maxv, 6))
        if key == "txpart":
            return int(r.random() < 0.4)
        if key == "skip_mode":
            return int(r.random() < 0.35)
        if key in ("pal_y", "pal_uv"):
            return int(r.random() < 0.5)
        if key == "pal_use_cache":
            return int(r.random() < 0.5)
        if key in ("part", "part_split"):
            # bias toward not splitting forever
            return int(r.integers(0, maxv + 1))
        if key == "eob_bin":
            if self.eob_small and r.random() < 0.7:
                return int(r.integers(0, min(3, maxv + 1)))
            return int(r.integers(0, maxv + 1))
        if key in ("lo_tok", "dc_lo_tok"):
            return int(min(r.geometric(0.6) - 1, maxv))
        if key in ("eob_tok", "dc_eob_tok"):
            return int(min(r.geometric(0.7) - 1, maxv))
        if key in ("hi_tok", "dc_hi_tok", "eob_hi_tok"):
            return int(min(r.geometric(0.5) - 1, maxv))
        if key in ("dc_golomb", "ac_golomb"):
            return int(min(r.geometric(0.3) - 1, 1000))
        if key == "use_filter_intra":
            return int(r.random() < 0.3)
        return int(r.integers(0, maxv + 1))


def make_seq_hdr(width, height, bitdepth=8, layout=h.PIXEL_LAYOUT_I420,
                 sb128=0, filter_intra=0, cdef=0, restoration=0,
                 monochrome=0, warped_motion=0, inter_intra=0,
                 masked_compound=0, dual_filter=0, order_hint=0,
                 order_hint_bits=7, jnt_comp=0,
                 ref_frame_mvs=0, screen_content=0,
                 super_res=0) -> h.SequenceHeader:
    s = h.SequenceHeader()
    s.screen_content_tools = screen_content  # 1 = fixed-enabled
    s.super_res = super_res
    s.warped_motion = warped_motion
    s.inter_intra = inter_intra
    s.masked_compound = masked_compound
    s.dual_filter = dual_filter
    s.order_hint = order_hint
    s.order_hint_n_bits = order_hint_bits if order_hint else 0
    s.jnt_comp = jnt_comp
    s.ref_frame_mvs = ref_frame_mvs
    s.max_width, s.max_height = width, height
    s.width_n_bits = max(1, (width - 1).bit_length())
    s.height_n_bits = max(1, (height - 1).bit_length())
    s.sb128 = sb128
    s.filter_intra = filter_intra
    s.cdef = cdef
    s.restoration = restoration
    s.hbd = {8: 0, 10: 1, 12: 2}[bitdepth]
    if bitdepth == 12:
        s.profile = 2
    s.monochrome = monochrome
    if monochrome:
        s.layout = h.PIXEL_LAYOUT_I400
        s.ss_hor = s.ss_ver = 1
    else:
        s.layout = layout
        s.ss_hor = 1 if layout != h.PIXEL_LAYOUT_I444 else 0
        s.ss_ver = 1 if layout == h.PIXEL_LAYOUT_I420 else 0
        if layout != h.PIXEL_LAYOUT_I420:
            s.profile = 2 if layout == h.PIXEL_LAYOUT_I422 else 1
    return s


def make_key_frame_hdr(seq, qidx=100, txfm_mode=h.TX_LARGEST,
                       disable_cdf_update=0, cdef_params=None,
                       loopfilter=(0, 0, 0, 0, 0),
                       intrabc=False, superres_denom=None,
                       tiles=(0, 0)) -> h.FrameHeader:
    f = h.FrameHeader()
    f.frame_type = h.KEY
    f.show_frame = 1
    if superres_denom is not None:
        f.super_res_enabled = 1
        f.super_res_width_scale_denominator = superres_denom
    f.allow_screen_content_tools = 1 if seq.screen_content_tools else 0
    f.allow_intrabc = 1 if intrabc else 0
    f.force_integer_mv = 1
    f.error_resilient_mode = 1
    w1 = seq.max_width
    if superres_denom is not None:
        d = superres_denom
        w0 = max((w1 * 8 + (d >> 1)) // d, min(16, w1))
    else:
        w0 = w1
    f.width = [w0, w1]
    f.height = seq.max_height
    f.render_width = seq.max_width
    f.render_height = seq.max_height
    f.quant_yac = qidx
    f.txfm_mode = txfm_mode if qidx else h.TX_4X4_ONLY
    f.disable_cdf_update = disable_cdf_update
    f.refresh_context = 0 if disable_cdf_update else 1
    ly0, ly1, lu, lv, sharp = loopfilter
    f.loopfilter_level_y = [ly0, ly1]
    f.loopfilter_level_u = lu
    f.loopfilter_level_v = lv
    f.loopfilter_sharpness = sharp
    f.loopfilter_mode_ref_delta_enabled = 1
    f.loopfilter_mode_ref_delta_update = 0
    if cdef_params is not None:
        f.cdef_damping = cdef_params["damping"]
        f.cdef_n_bits = cdef_params["n_bits"]
        for i, (ys, uvs) in enumerate(zip(cdef_params["y_strength"],
                                          cdef_params["uv_strength"])):
            f.cdef_y_strength[i] = ys
            f.cdef_uv_strength[i] = uvs
    from ..host.obu import compute_uniform_tiling, derive_lossless
    f.tiling.log2_cols, f.tiling.log2_rows = tiles
    compute_uniform_tiling(seq, f)
    derive_lossless(f)
    return f


def make_inter_frame_hdr(seq, qidx=100, refidx=None, txfm_mode=h.TX_LARGEST,
                         loopfilter=(0, 0, 0, 0, 0), cdef_params=None,
                         hp=1, switchable_filter=False, switchable_comp=False,
                         switchable_motion=False, refresh=0xFF,
                         frame_offset=0, warp=False, primary_ref=None,
                         skip_mode=False, use_ref_frame_mvs=False,
                         superres_denom=None, tiles=(0, 0),
                         frame_type=h.INTER, error_resilient=None,
                         size_from_ref=None) -> h.FrameHeader:
    """frame_type: h.INTER or h.SWITCH (dav1d obu.c:446-511 SWITCH
    semantics: error_resilient + frame_size_override + refresh=0xFF all
    implied, never coded). size_from_ref: refidx slot whose size this
    frame inherits via frame_size_with_refs (obu.c:342-372; requires
    !error_resilient). error_resilient: force the flag (None = derive
    from the features that are only coded when it is off)."""
    f = h.FrameHeader()
    f.frame_type = frame_type
    f.show_frame = 1
    f.allow_screen_content_tools = 1 if seq.screen_content_tools else 0
    # warp_motion, primary_ref_frame and use_ref_frame_mvs are only coded
    # when !error_resilient (obu.c:622, :358, :377)
    if error_resilient is None:
        f.error_resilient_mode = 0 if (warp or primary_ref is not None or
                                       use_ref_frame_mvs or
                                       size_from_ref is not None) else 1
    else:
        f.error_resilient_mode = int(error_resilient)
    if frame_type == h.SWITCH:
        # implied, not coded (host/obu.py:313-333,365)
        f.error_resilient_mode = 1
        f.frame_size_override = 1
        refresh = 0xFF
        assert primary_ref is None and size_from_ref is None
    elif size_from_ref is not None:
        assert not f.error_resilient_mode, \
            "frame_size_with_refs requires !error_resilient"
        f.frame_size_override = 1
        f.size_from_ref = size_from_ref
    f.warp_motion = 1 if warp else 0
    if warp:
        switchable_motion = True
    if primary_ref is not None:
        f.primary_ref_frame = primary_ref
    f.skip_mode_enabled = 1 if skip_mode else 0
    f.force_integer_mv = 0
    f.width = [seq.max_width, seq.max_width]
    f.height = seq.max_height
    f.render_width = seq.max_width
    f.render_height = seq.max_height
    f.refidx = list(refidx) if refidx is not None else [0] * 7
    f.refresh_frame_flags = refresh
    f.hp = hp
    f.subpel_filter_mode = h.FILTER_SWITCHABLE if switchable_filter \
        else h.FILTER_8TAP_REGULAR
    f.switchable_motion_mode = 1 if switchable_motion else 0
    f.use_ref_frame_mvs = 1 if use_ref_frame_mvs else 0
    f.frame_offset = frame_offset
    if superres_denom is not None:
        f.super_res_enabled = 1
        f.super_res_width_scale_denominator = superres_denom
        d = superres_denom
        f.width = [max((f.width[1] * 8 + (d >> 1)) // d,
                       min(16, f.width[1])), f.width[1]]
    f.quant_yac = qidx
    f.txfm_mode = txfm_mode if qidx else h.TX_4X4_ONLY
    f.disable_cdf_update = 0
    f.refresh_context = 1
    ly0, ly1, lu, lv, sharp = loopfilter
    f.loopfilter_level_y = [ly0, ly1]
    f.loopfilter_level_u = lu
    f.loopfilter_level_v = lv
    f.loopfilter_sharpness = sharp
    f.loopfilter_mode_ref_delta_enabled = 1
    f.loopfilter_mode_ref_delta_update = 0
    if cdef_params is not None:
        f.cdef_damping = cdef_params["damping"]
        f.cdef_n_bits = cdef_params["n_bits"]
        for i, (ys, uvs) in enumerate(zip(cdef_params["y_strength"],
                                          cdef_params["uv_strength"])):
            f.cdef_y_strength[i] = ys
            f.cdef_uv_strength[i] = uvs
    f.switchable_comp_refs = 1 if switchable_comp else 0
    from ..host.obu import compute_uniform_tiling, derive_lossless
    f.tiling.log2_cols, f.tiling.log2_rows = tiles
    compute_uniform_tiling(seq, f)
    derive_lossless(f)
    return f


def make_random_gmv(rng, typ, hp=1) -> h.WarpedMotionParams:
    """Random small-magnitude global-motion params of the given type."""
    g = h.WarpedMotionParams()
    g.type = typ
    m = g.matrix
    if typ >= h.WM_TYPE_ROT_ZOOM:
        m[2] = 0x10000 + 2 * int(rng.integers(-48, 49))
        m[3] = 2 * int(rng.integers(-48, 49))
        if typ == h.WM_TYPE_AFFINE:
            m[4] = 2 * int(rng.integers(-48, 49))
            m[5] = 0x10000 + 2 * int(rng.integers(-48, 49))
        else:
            m[4] = -m[3]
            m[5] = m[2]
        shift = 10
    else:
        shift = 13 + (0 if hp else 1)
    m[0] = int(rng.integers(-16, 17)) * (1 << shift)
    m[1] = int(rng.integers(-16, 17)) * (1 << shift)
    return g


def set_segmentation(f, segs, update_map=1, temporal=0, update_data=1,
                     inherit_from=None):
    """Enable segmentation. segs: list of up to 8 dicts of
    SegmentationData fields (None = all-zero segment); inherit_from: the
    primary-ref FrameHeader when update_data=0."""
    f.segmentation_enabled = 1
    f.segmentation_update_map = update_map
    f.segmentation_temporal = temporal
    f.segmentation_update_data = update_data
    if update_data:
        sd = h.SegmentationDataSet()
        sd.preskip = 0
        sd.last_active_segid = -1
        for i, cfgd in enumerate(segs):
            seg = sd.d[i]
            for k, v in (cfgd or {}).items():
                setattr(seg, k, v)
            if (seg.delta_q or seg.delta_lf_y_v or seg.delta_lf_y_h or
                    seg.delta_lf_u or seg.delta_lf_v or seg.ref >= 0 or
                    seg.skip or seg.globalmv):
                sd.last_active_segid = i
            if seg.ref >= 0 or seg.skip or seg.globalmv:
                sd.preskip = 1
        f.seg_data = sd
    else:
        f.seg_data = inherit_from.seg_data
    from ..host.obu import derive_lossless
    derive_lossless(f)


def set_delta_params(f, delta_q_res=0, delta_lf_res=None, delta_lf_multi=0):
    """Enable per-superblock delta-q (and optionally delta-lf) coding."""
    f.delta_q_present = 1
    f.delta_q_res_log2 = delta_q_res
    if delta_lf_res is not None and not f.allow_intrabc:
        f.delta_lf_present = 1
        f.delta_lf_res_log2 = delta_lf_res
        f.delta_lf_multi = delta_lf_multi


def gen_intra_frame(seq, fhdr, policy, cdf=None) -> tuple[bytes, TileCoder]:
    """Encode one intra frame's single tile; returns (tile payload, coder)."""
    if cdf is None:
        cdf = new_cdf_context(qcat_from_qidx(fhdr.quant_yac))
    enc = MsacEncoder(allow_update_cdf=not fhdr.disable_cdf_update)
    rf = None
    if fhdr.allow_intrabc:
        from ..host.refmvs import RefmvsFrame
        bw4 = ((fhdr.width[0] + 7) >> 3) << 1
        bh4 = ((fhdr.height + 7) >> 3) << 1
        rf = RefmvsFrame(fhdr, seq, bw4, bh4)
    coder = TileCoder(seq, fhdr, cdf, EncodeSide(enc, policy), rf=rf)
    coder.code_tile()
    return enc.finish(), coder


def gen_inter_frame(seq, fhdr, policy, cdf=None, ref_poc=None,
                    temporal=None, ref_scaled=None, prev_segmap=None
                    ) -> tuple[bytes, TileCoder]:
    """Encode one inter frame's single tile; returns (tile payload, coder).
    Symbol choices come from the policy; MV/mode derivation (refmvs
    candidate stacks) evolves exactly as in the decoder, so the stream is
    conformant by construction. cdf: inherited CDF context (CDF forward
    adaptation); ref_poc: frame_offset per refidx slot (order-hint
    streams); temporal: (ref_ref_poc 7x7, rp_ref 7-list) for
    use_ref_frame_mvs streams."""
    from ..host.refmvs import RefmvsFrame
    if cdf is None:
        cdf = new_cdf_context(qcat_from_qidx(fhdr.quant_yac))
    enc = MsacEncoder(allow_update_cdf=not fhdr.disable_cdf_update)
    bw4 = ((fhdr.width[0] + 7) >> 3) << 1
    bh4 = ((fhdr.height + 7) >> 3) << 1
    rf = RefmvsFrame(fhdr, seq, bw4, bh4, ref_poc=ref_poc)
    if temporal is not None:
        ref_ref_poc, rp_ref = temporal
        rf.setup_temporal(seq, fhdr, ref_poc, ref_ref_poc, rp_ref)
    coder = TileCoder(seq, fhdr, cdf, EncodeSide(enc, policy), rf=rf,
                      ref_poc=ref_poc, ref_scaled=ref_scaled,
                      prev_segmap=prev_segmap)
    coder.code_tile()
    return enc.finish(), coder


def gen_ivf(seq, frames) -> bytes:
    """frames: list of (fhdr, tile_payload) or (fhdr, tile_payload,
    ref_hdrs snapshot); tile_payload is None for show-existing frames.
    Returns a full IVF stream."""
    out = [b"".join(obus) for obus in _frame_obus(seq, frames)]
    return ow.write_ivf(out, seq.max_width, seq.max_height)


def _frame_obus(seq, frames):
    out_frames = []
    for i, entry in enumerate(frames):
        fhdr, tile = entry[0], entry[1]
        ref_hdrs = entry[2] if len(entry) > 2 else None
        obus = [ow.write_obu(h.OBU_TD, b"")]
        if i == 0:
            obus.append(ow.write_obu(h.OBU_SEQ_HDR, ow.write_seq_hdr(seq)))
        obus.append(ow.write_obu(
            h.OBU_FRAME_HDR,
            ow.write_frame_hdr(fhdr, seq, standalone=True,
                               ref_hdrs=ref_hdrs)))
        if not fhdr.show_existing_frame:
            obus.append(ow.write_obu(
                h.OBU_TILE_GRP,
                ow.write_tile_group(tile,
                                    n_bytes=fhdr.tiling.n_bytes or 4)))
        out_frames.append(obus)
    return out_frames


def gen_section5(seq, frames) -> bytes:
    """Raw Section-5 OBU stream (temporal units delimited by TD OBUs)."""
    return b"".join(b"".join(obus) for obus in _frame_obus(seq, frames))


def _uleb(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _strip_obu_size(obu: bytes) -> bytes:
    """Rewrite an OBU without its size field (Annex-B obu framing)."""
    hdr = obu[0]
    assert (hdr >> 1) & 1, "expected size field"
    pos = 1 + (1 if (hdr >> 2) & 1 else 0)  # extension byte
    # skip the uleb length
    p = pos
    while obu[p] & 0x80:
        p += 1
    p += 1
    return bytes([hdr & ~0x02]) + obu[1:pos] + obu[p:]


def gen_annexb(seq, frames) -> bytes:
    """Annex-B length-delimited stream (tools/input/annexb.c layout)."""
    out = bytearray()
    for obus in _frame_obus(seq, frames):
        # one frame unit per temporal unit; the TD OBU leads each unit
        payload = bytearray()
        for obu in obus:
            stripped = _strip_obu_size(obu)
            payload += _uleb(len(stripped)) + stripped
        fu = _uleb(len(payload)) + payload
        out += _uleb(len(fu)) + fu
    return bytes(out)


def gen_frame_tiles(seq, fhdr, policy, cdf=None, ref_poc=None,
                    temporal=None, ref_scaled=None):
    """Encode all tiles of one frame (intra or inter); returns
    (list of tile payloads, list of coders). Each tile starts from a copy
    of the frame's input CDFs (dav1d setup_tile semantics)."""
    from ..host.refmvs import RefmvsFrame
    if cdf is None:
        cdf = new_cdf_context(qcat_from_qidx(fhdr.quant_yac))
    keyframe = fhdr.frame_type in (h.KEY, h.INTRA)
    rf = None
    if not keyframe or fhdr.allow_intrabc:
        bw4 = ((fhdr.width[0] + 7) >> 3) << 1
        bh4 = ((fhdr.height + 7) >> 3) << 1
        rf = RefmvsFrame(fhdr, seq, bw4, bh4, ref_poc=ref_poc)
        if temporal is not None:
            ref_ref_poc, rp_ref = temporal
            rf.setup_temporal(seq, fhdr, ref_poc, ref_ref_poc, rp_ref)
    payloads = []
    coders = []
    t = fhdr.tiling
    for tile_row in range(t.rows):
        for tile_col in range(t.cols):
            enc = MsacEncoder(
                allow_update_cdf=not fhdr.disable_cdf_update)
            coder = TileCoder(seq, fhdr, cdf.copy(),
                              EncodeSide(enc, policy),
                              tile_col=tile_col, tile_row=tile_row,
                              rf=rf, ref_poc=ref_poc,
                              ref_scaled=ref_scaled)
            coder.code_tile()
            payloads.append(enc.finish())
            coders.append(coder)
    return payloads, coders
