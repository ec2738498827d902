"""OBU/header writers for the test-stream generator.

Supports the subset of header configurations the generator emits (asserts on
anything else); field order mirrors host/obu.py parsing exactly, which in
turn mirrors the AV1 spec (cross-checked vs dav1d src/obu.c).
"""
from __future__ import annotations

import struct

from ..host import headers as h
from .bitwriter import BitWriter


def write_obu(obu_type: int, payload: bytes, temporal_id: int = 0,
              spatial_id: int = 0) -> bytes:
    w = BitWriter()
    has_extension = temporal_id or spatial_id
    w.put_bit(0)  # forbidden
    w.put_bits(obu_type, 4)
    w.put_bit(1 if has_extension else 0)
    w.put_bit(1)  # has_length_field
    w.put_bit(0)  # reserved
    if has_extension:
        w.put_bits(temporal_id, 3)
        w.put_bits(spatial_id, 2)
        w.put_bits(0, 3)
    w.put_uleb128(len(payload))
    return w.get_bytes() + payload


def write_seq_hdr(s: h.SequenceHeader) -> bytes:
    w = BitWriter()
    w.put_bits(s.profile, 3)
    w.put_bit(s.still_picture)
    w.put_bit(s.reduced_still_picture_header)
    assert not s.reduced_still_picture_header, "unsupported in writer"
    w.put_bit(s.timing_info_present)
    assert not s.timing_info_present
    w.put_bit(s.display_model_info_present)
    assert not s.display_model_info_present
    w.put_bits(s.num_operating_points - 1, 5)
    for op in s.operating_points:
        w.put_bits(op.idc, 12)
        w.put_bits(op.major_level - 2, 3)
        w.put_bits(op.minor_level, 2)
        if op.major_level > 3:
            w.put_bit(op.tier)
    w.put_bits(s.width_n_bits - 1, 4)
    w.put_bits(s.height_n_bits - 1, 4)
    w.put_bits(s.max_width - 1, s.width_n_bits)
    w.put_bits(s.max_height - 1, s.height_n_bits)
    w.put_bit(s.frame_id_numbers_present)
    assert not s.frame_id_numbers_present
    w.put_bit(s.sb128)
    w.put_bit(s.filter_intra)
    w.put_bit(s.intra_edge_filter)
    w.put_bit(s.inter_intra)
    w.put_bit(s.masked_compound)
    w.put_bit(s.warped_motion)
    w.put_bit(s.dual_filter)
    w.put_bit(s.order_hint)
    if s.order_hint:
        w.put_bit(s.jnt_comp)
        w.put_bit(s.ref_frame_mvs)
    if s.screen_content_tools == h.ADAPTIVE:
        w.put_bit(1)
    else:
        w.put_bit(0)
        w.put_bit(s.screen_content_tools)
    if s.screen_content_tools:
        if s.force_integer_mv == h.ADAPTIVE:
            w.put_bit(1)
        else:
            w.put_bit(0)
            w.put_bit(s.force_integer_mv)
    if s.order_hint:
        w.put_bits(s.order_hint_n_bits - 1, 3)
    w.put_bit(s.super_res)
    w.put_bit(s.cdef)
    w.put_bit(s.restoration)
    # color config
    w.put_bit(1 if s.hbd else 0)
    if s.profile == 2 and s.hbd:
        w.put_bit(s.hbd - 1)
    if s.profile != 1:
        w.put_bit(s.monochrome)
    w.put_bit(s.color_description_present)
    if s.color_description_present:
        w.put_bits(s.pri, 8)
        w.put_bits(s.trc, 8)
        w.put_bits(s.mtrx, 8)
    if s.monochrome:
        w.put_bit(s.color_range)
    elif s.pri == 1 and s.trc == 13 and s.mtrx == 0:
        pass
    else:
        w.put_bit(s.color_range)
        if s.profile == 2 and s.hbd == 2:
            w.put_bit(s.ss_hor)
            if s.ss_hor:
                w.put_bit(s.ss_ver)
        if s.ss_hor and s.ss_ver:
            w.put_bits(s.chr, 2)
    if not s.monochrome:
        w.put_bit(s.separate_uv_delta_q)
    w.put_bit(s.film_grain_present)
    w.trailing_bits()
    return w.get_bytes()


def write_frame_hdr(hdr: h.FrameHeader, seq: h.SequenceHeader,
                    standalone: bool = True, ref_hdrs=None) -> bytes:
    """standalone=True -> OBU_FRAME_HDR payload (with trailing bits);
    False -> the header part of an OBU_FRAME (byte-aligned, no trailing).
    ref_hdrs: 8-slot FrameHeader state (required with order_hint inter)."""
    w = BitWriter()
    assert not seq.reduced_still_picture_header
    w.put_bit(hdr.show_existing_frame)
    if hdr.show_existing_frame:
        w.put_bits(hdr.existing_frame_idx, 3)
        assert not seq.decoder_model_info_present
        assert not seq.frame_id_numbers_present
        if standalone:
            w.trailing_bits()
        else:
            w.bytealign()
        return w.get_bytes()
    w.put_bits(hdr.frame_type, 2)
    w.put_bit(hdr.show_frame)
    if not hdr.show_frame:
        w.put_bit(hdr.showable_frame)
    if not ((hdr.frame_type == h.KEY and hdr.show_frame) or
            hdr.frame_type == h.SWITCH):
        w.put_bit(hdr.error_resilient_mode)
    w.put_bit(hdr.disable_cdf_update)
    if seq.screen_content_tools == h.ADAPTIVE:
        w.put_bit(hdr.allow_screen_content_tools)
    if hdr.allow_screen_content_tools:
        if seq.force_integer_mv == h.ADAPTIVE:
            w.put_bit(hdr.force_integer_mv if not h.is_key_or_intra(hdr)
                      else 1)
    if hdr.frame_type != h.SWITCH:
        w.put_bit(hdr.frame_size_override)
    if seq.order_hint:
        w.put_bits(hdr.frame_offset, seq.order_hint_n_bits)
    if not hdr.error_resilient_mode and h.is_inter_or_switch(hdr):
        w.put_bits(hdr.primary_ref_frame, 3)

    if h.is_key_or_intra(hdr):
        if not (hdr.frame_type == h.KEY and hdr.show_frame):
            w.put_bits(hdr.refresh_frame_flags, 8)
            assert not (hdr.refresh_frame_flags != 0xFF and
                        hdr.error_resilient_mode and seq.order_hint)
        _write_frame_size(w, hdr, seq)
        if hdr.allow_screen_content_tools and not hdr.super_res_enabled:
            w.put_bit(hdr.allow_intrabc)
    else:
        if hdr.frame_type != h.SWITCH:   # SWITCH implies 0xFF (obu.c:465)
            w.put_bits(hdr.refresh_frame_flags, 8)
        if hdr.error_resilient_mode and seq.order_hint:
            for i in range(8):
                assert ref_hdrs is not None and ref_hdrs[i] is not None
                w.put_bits(ref_hdrs[i].frame_offset, seq.order_hint_n_bits)
        if seq.order_hint:
            w.put_bit(hdr.frame_ref_short_signaling)
        if hdr.frame_ref_short_signaling:
            # only LAST + GOLDEN slots are coded; caller must have set
            # hdr.refidx to the spec-7.8 derivation for these slots
            w.put_bits(hdr.refidx[0], 3)
            w.put_bits(hdr.refidx[3], 3)
        else:
            for i in range(7):
                w.put_bits(hdr.refidx[i], 3)
        if not hdr.frame_size_override or hdr.error_resilient_mode:
            _write_frame_size(w, hdr, seq)
        else:
            # frame_size_with_refs (dav1d obu.c:342-372): one found_ref
            # bit per refidx slot; hdr.size_from_ref selects the slot
            # whose size is inherited (the caller must have copied that
            # ref's width[1]/height/render_* into hdr), None = signal
            # no match and fall back to the explicit override size
            sfr = getattr(hdr, "size_from_ref", None)
            found = False
            for i in range(7):
                if i == sfr:
                    w.put_bit(1)
                    found = True
                    break
                w.put_bit(0)
            if found:
                if seq.super_res:
                    w.put_bit(hdr.super_res_enabled)
                    if hdr.super_res_enabled:
                        w.put_bits(
                            hdr.super_res_width_scale_denominator - 9, 3)
            else:
                _write_frame_size(w, hdr, seq)
        if not hdr.force_integer_mv:
            w.put_bit(hdr.hp)
        if hdr.subpel_filter_mode == h.FILTER_SWITCHABLE:
            w.put_bit(1)
        else:
            w.put_bit(0)
            w.put_bits(hdr.subpel_filter_mode, 2)
        w.put_bit(hdr.switchable_motion_mode)
        if (not hdr.error_resilient_mode and seq.ref_frame_mvs and
                seq.order_hint):
            w.put_bit(hdr.use_ref_frame_mvs)

    if not hdr.disable_cdf_update:
        w.put_bit(0 if hdr.refresh_context else 1)

    # tiling (uniform only)
    t = hdr.tiling
    w.put_bit(t.uniform)
    assert t.uniform
    sbsz_min1 = (64 << seq.sb128) - 1
    sbsz_log2 = 6 + seq.sb128
    sbw = (hdr.width[0] + sbsz_min1) >> sbsz_log2
    sbh = (hdr.height + sbsz_min1) >> sbsz_log2
    max_tile_width_sb = 4096 >> sbsz_log2
    max_tile_area_sb = (4096 * 2304) >> (2 * sbsz_log2)

    def tile_log2(sz, tgt):
        k = 0
        while (sz << k) < tgt:
            k += 1
        return k
    min_log2_cols = tile_log2(max_tile_width_sb, sbw)
    max_log2_cols = tile_log2(1, min(sbw, h.MAX_TILE_COLS))
    max_log2_rows = tile_log2(1, min(sbh, h.MAX_TILE_ROWS))
    min_log2_tiles = max(tile_log2(max_tile_area_sb, sbw * sbh),
                         min_log2_cols)
    assert t.log2_cols >= min_log2_cols and t.log2_cols <= max_log2_cols
    for _ in range(t.log2_cols - min_log2_cols):
        w.put_bit(1)
    if t.log2_cols < max_log2_cols:
        w.put_bit(0)
    min_log2_rows = max(min_log2_tiles - t.log2_cols, 0)
    assert t.log2_rows >= min_log2_rows and t.log2_rows <= max_log2_rows
    for _ in range(t.log2_rows - min_log2_rows):
        w.put_bit(1)
    if t.log2_rows < max_log2_rows:
        w.put_bit(0)
    if t.log2_cols or t.log2_rows:
        w.put_bits(t.update, t.log2_cols + t.log2_rows)
        w.put_bits(t.n_bytes - 1, 2)

    # quant
    w.put_bits(hdr.quant_yac, 8)
    _put_delta_q(w, hdr.quant_ydc_delta)
    if not seq.monochrome:
        if seq.separate_uv_delta_q:
            diff_uv = (hdr.quant_vdc_delta != hdr.quant_udc_delta or
                       hdr.quant_vac_delta != hdr.quant_uac_delta)
            w.put_bit(diff_uv)
        else:
            diff_uv = False
        _put_delta_q(w, hdr.quant_udc_delta)
        _put_delta_q(w, hdr.quant_uac_delta)
        if diff_uv:
            _put_delta_q(w, hdr.quant_vdc_delta)
            _put_delta_q(w, hdr.quant_vac_delta)
    w.put_bit(hdr.quant_qm)
    if hdr.quant_qm:
        w.put_bits(hdr.quant_qm_y, 4)
        w.put_bits(hdr.quant_qm_u, 4)
        if seq.separate_uv_delta_q:
            w.put_bits(hdr.quant_qm_v, 4)

    # segmentation
    w.put_bit(hdr.segmentation_enabled)
    if hdr.segmentation_enabled:
        if hdr.primary_ref_frame != h.PRIMARY_REF_NONE:
            w.put_bit(hdr.segmentation_update_map)
            if hdr.segmentation_update_map:
                w.put_bit(hdr.segmentation_temporal)
            w.put_bit(hdr.segmentation_update_data)
        else:
            assert (hdr.segmentation_update_map and
                    not hdr.segmentation_temporal and
                    hdr.segmentation_update_data)
        if hdr.segmentation_update_data:
            for i in range(h.MAX_SEGMENTS):
                seg = hdr.seg_data.d[i]
                _put_opt_sbits(w, seg.delta_q, 9)
                _put_opt_sbits(w, seg.delta_lf_y_v, 7)
                _put_opt_sbits(w, seg.delta_lf_y_h, 7)
                _put_opt_sbits(w, seg.delta_lf_u, 7)
                _put_opt_sbits(w, seg.delta_lf_v, 7)
                if seg.ref >= 0:
                    w.put_bit(1)
                    w.put_bits(seg.ref, 3)
                else:
                    w.put_bit(0)
                w.put_bit(seg.skip)
                w.put_bit(seg.globalmv)

    # delta q / lf
    if hdr.quant_yac:
        w.put_bit(hdr.delta_q_present)
    if hdr.delta_q_present:
        w.put_bits(hdr.delta_q_res_log2, 2)
        if not hdr.allow_intrabc:
            w.put_bit(hdr.delta_lf_present)
            if hdr.delta_lf_present:
                w.put_bits(hdr.delta_lf_res_log2, 2)
                w.put_bit(hdr.delta_lf_multi)

    # recompute lossless (writer-side sanity)
    delta_lossless = (not hdr.quant_ydc_delta and not hdr.quant_udc_delta
                      and not hdr.quant_uac_delta and not hdr.quant_vdc_delta
                      and not hdr.quant_vac_delta)
    all_lossless = all(
        not max(0, min(255, hdr.quant_yac + (hdr.seg_data.d[i].delta_q
                                             if hdr.segmentation_enabled
                                             else 0))) and delta_lossless
        for i in range(h.MAX_SEGMENTS))

    # loopfilter
    if not (all_lossless or hdr.allow_intrabc):
        w.put_bits(hdr.loopfilter_level_y[0], 6)
        w.put_bits(hdr.loopfilter_level_y[1], 6)
        if not seq.monochrome and (hdr.loopfilter_level_y[0] or
                                   hdr.loopfilter_level_y[1]):
            w.put_bits(hdr.loopfilter_level_u, 6)
            w.put_bits(hdr.loopfilter_level_v, 6)
        w.put_bits(hdr.loopfilter_sharpness, 3)
        w.put_bit(hdr.loopfilter_mode_ref_delta_enabled)
        if hdr.loopfilter_mode_ref_delta_enabled:
            w.put_bit(hdr.loopfilter_mode_ref_delta_update)
            if hdr.loopfilter_mode_ref_delta_update:
                defaults = h.LoopfilterModeRefDeltas()
                for i in range(8):
                    d = hdr.loopfilter_mode_ref_deltas.ref_delta[i]
                    if d != defaults.ref_delta[i]:
                        w.put_bit(1)
                        w.put_sbits(d, 7)
                    else:
                        w.put_bit(0)
                for i in range(2):
                    d = hdr.loopfilter_mode_ref_deltas.mode_delta[i]
                    if d != defaults.mode_delta[i]:
                        w.put_bit(1)
                        w.put_sbits(d, 7)
                    else:
                        w.put_bit(0)

    # cdef
    if not all_lossless and seq.cdef and not hdr.allow_intrabc:
        w.put_bits(hdr.cdef_damping - 3, 2)
        w.put_bits(hdr.cdef_n_bits, 2)
        for i in range(1 << hdr.cdef_n_bits):
            w.put_bits(hdr.cdef_y_strength[i], 6)
            if not seq.monochrome:
                w.put_bits(hdr.cdef_uv_strength[i], 6)

    # restoration
    if (not all_lossless or hdr.super_res_enabled) and seq.restoration \
            and not hdr.allow_intrabc:
        w.put_bits(hdr.restoration_type[0], 2)
        if not seq.monochrome:
            w.put_bits(hdr.restoration_type[1], 2)
            w.put_bits(hdr.restoration_type[2], 2)
        if any(hdr.restoration_type):
            us = hdr.restoration_unit_size[0]
            base = 6 + seq.sb128
            if us > base:
                w.put_bit(1)
                if not seq.sb128:
                    w.put_bit(us - base - 1)
            else:
                w.put_bit(0)
            if (hdr.restoration_type[1] or hdr.restoration_type[2]) and \
                    seq.ss_hor == 1 and seq.ss_ver == 1:
                w.put_bit(hdr.restoration_unit_size[0] -
                          hdr.restoration_unit_size[1])

    # txfm mode
    if not all_lossless:
        w.put_bit(1 if hdr.txfm_mode == h.TX_SWITCHABLE else 0)
    if h.is_inter_or_switch(hdr):
        w.put_bit(hdr.switchable_comp_refs)
        if hdr.switchable_comp_refs and seq.order_hint:
            from ..host.obu import derive_skip_mode
            assert ref_hdrs is not None
            derive_skip_mode(seq, hdr, ref_hdrs)
        if hdr.skip_mode_allowed:
            w.put_bit(hdr.skip_mode_enabled)
        else:
            hdr.skip_mode_enabled = 0
        if not hdr.error_resilient_mode and seq.warped_motion:
            w.put_bit(hdr.warp_motion)
    w.put_bit(hdr.reduced_txtp_set)

    if h.is_inter_or_switch(hdr):
        for i in range(7):
            g = hdr.gmv[i]
            w.put_bit(g.type != h.WM_TYPE_IDENTITY)
            if g.type == h.WM_TYPE_IDENTITY:
                continue
            w.put_bit(g.type == h.WM_TYPE_ROT_ZOOM)
            if g.type != h.WM_TYPE_ROT_ZOOM:
                w.put_bit(g.type == h.WM_TYPE_TRANSLATION)
            if hdr.primary_ref_frame == h.PRIMARY_REF_NONE:
                ref_gmv = h.WarpedMotionParams()
            else:
                assert ref_hdrs is not None
                ref_gmv = ref_hdrs[hdr.refidx[hdr.primary_ref_frame]].gmv[i]
            mat, ref_mat = g.matrix, ref_gmv.matrix
            if g.type >= h.WM_TYPE_ROT_ZOOM:
                w.put_bits_subexp((mat[2] - (1 << 16)) >> 1,
                                  (ref_mat[2] - (1 << 16)) >> 1, 12)
                w.put_bits_subexp(mat[3] >> 1, ref_mat[3] >> 1, 12)
                bits, shift = 12, 10
            else:
                bits, shift = 9 - (not hdr.hp), 13 + (not hdr.hp)
            if g.type == h.WM_TYPE_AFFINE:
                w.put_bits_subexp(mat[4] >> 1, ref_mat[4] >> 1, 12)
                w.put_bits_subexp((mat[5] - (1 << 16)) >> 1,
                                  (ref_mat[5] - (1 << 16)) >> 1, 12)
            w.put_bits_subexp(mat[0] >> shift, ref_mat[0] >> shift, bits)
            w.put_bits_subexp(mat[1] >> shift, ref_mat[1] >> shift, bits)

    if seq.film_grain_present and (hdr.show_frame or hdr.showable_frame):
        w.put_bit(hdr.film_grain_present)
        if hdr.film_grain_present:
            fgd = hdr.film_grain_data
            w.put_bits(fgd.seed, 16)
            if hdr.frame_type == h.INTER:
                w.put_bit(hdr.film_grain_update)
            assert hdr.film_grain_update
            w.put_bits(fgd.num_y_points, 4)
            for x, y in fgd.y_points:
                w.put_bits(x, 8)
                w.put_bits(y, 8)
            if not seq.monochrome:
                w.put_bit(fgd.chroma_scaling_from_luma)
            if not (seq.monochrome or fgd.chroma_scaling_from_luma or
                    (seq.ss_ver == 1 and seq.ss_hor == 1 and
                     not fgd.num_y_points)):
                for pl in range(2):
                    w.put_bits(fgd.num_uv_points[pl], 4)
                    for x, y in fgd.uv_points[pl]:
                        w.put_bits(x, 8)
                        w.put_bits(y, 8)
            w.put_bits(fgd.scaling_shift - 8, 2)
            w.put_bits(fgd.ar_coeff_lag, 2)
            num_y_pos = 2 * fgd.ar_coeff_lag * (fgd.ar_coeff_lag + 1)
            if fgd.num_y_points:
                for i in range(num_y_pos):
                    w.put_bits(fgd.ar_coeffs_y[i] + 128, 8)
            for pl in range(2):
                if fgd.num_uv_points[pl] or fgd.chroma_scaling_from_luma:
                    num_uv_pos = num_y_pos + bool(fgd.num_y_points)
                    for i in range(num_uv_pos):
                        w.put_bits(fgd.ar_coeffs_uv[pl][i] + 128, 8)
            w.put_bits(fgd.ar_coeff_shift - 6, 2)
            w.put_bits(fgd.grain_scale_shift, 2)
            for pl in range(2):
                if fgd.num_uv_points[pl]:
                    w.put_bits(fgd.uv_mult[pl] + 128, 8)
                    w.put_bits(fgd.uv_luma_mult[pl] + 128, 8)
                    w.put_bits(fgd.uv_offset[pl] + 256, 9)
            w.put_bit(fgd.overlap_flag)
            w.put_bit(fgd.clip_to_restricted_range)

    if standalone:
        w.trailing_bits()
    else:
        w.bytealign()
    return w.get_bytes()


def _write_frame_size(w: BitWriter, hdr: h.FrameHeader,
                      seq: h.SequenceHeader):
    if hdr.frame_size_override:
        w.put_bits(hdr.width[1] - 1, seq.width_n_bits)
        w.put_bits(hdr.height - 1, seq.height_n_bits)
    if seq.super_res:
        w.put_bit(hdr.super_res_enabled)
        if hdr.super_res_enabled:
            w.put_bits(hdr.super_res_width_scale_denominator - 9, 3)
    w.put_bit(hdr.have_render_size)
    if hdr.have_render_size:
        w.put_bits(hdr.render_width - 1, 16)
        w.put_bits(hdr.render_height - 1, 16)


def _put_delta_q(w: BitWriter, v: int):
    if v:
        w.put_bit(1)
        w.put_sbits(v, 7)
    else:
        w.put_bit(0)


def _put_opt_sbits(w: BitWriter, v: int, n: int):
    if v:
        w.put_bit(1)
        w.put_sbits(v, n)
    else:
        w.put_bit(0)


def write_tile_group(tile_payloads, n_bytes: int = 4) -> bytes:
    """tile_payloads: one bytes object per tile (all tiles in one group).
    Non-final tiles are prefixed with their size-1 in n_bytes LE bytes."""
    if isinstance(tile_payloads, (bytes, bytearray)):
        tile_payloads = [bytes(tile_payloads)]
    w = BitWriter()
    if len(tile_payloads) > 1:
        w.put_bit(0)  # tile_start_and_end_present = 0 (all tiles)
    w.bytealign()
    out = bytearray(w.get_bytes())
    for i, t in enumerate(tile_payloads):
        if i != len(tile_payloads) - 1:
            out += (len(t) - 1).to_bytes(n_bytes, "little")
        out += t
    return bytes(out)


def write_ivf(frames: list, width: int, height: int, fps=(30, 1)) -> bytes:
    hdr = struct.pack("<4sHH4sHHIII4x", b"DKIF", 0, 32, b"AV01",
                      width, height, fps[0], fps[1], len(frames))
    out = bytearray(hdr)
    for i, f in enumerate(frames):
        out += struct.pack("<IQ", len(f), i)
        out += f
    return bytes(out)


def write_metadata_cll(max_cll: int, max_fall: int) -> bytes:
    """HDR CLL metadata OBU payload (dav1d obu.c OBU_META_HDR_CLL)."""
    w = BitWriter()
    w.put_uleb128(1)
    w.put_bits(max_cll, 16)
    w.put_bits(max_fall, 16)
    w.trailing_bits()
    return w.get_bytes()


def write_metadata_mdcv(primaries, white_point, max_lum, min_lum) -> bytes:
    """HDR MDCV metadata OBU payload."""
    w = BitWriter()
    w.put_uleb128(2)
    for px, py in primaries:
        w.put_bits(px, 16)
        w.put_bits(py, 16)
    w.put_bits(white_point[0], 16)
    w.put_bits(white_point[1], 16)
    w.put_bits(max_lum, 32)
    w.put_bits(min_lum, 32)
    w.trailing_bits()
    return w.get_bytes()


def write_metadata_t35(country_code: int, payload: bytes, ext: int = 0) -> bytes:
    """ITU-T T.35 metadata OBU payload."""
    w = BitWriter()
    w.put_uleb128(4)
    w.put_bits(country_code, 8)
    if country_code == 0xFF:
        w.put_bits(ext, 8)
    for b in payload:
        w.put_bits(b, 8)
    w.trailing_bits()
    return w.get_bytes()
