"""Device (TPU/XLA) in-loop filter pipeline: deblock -> CDEF -> LR.

Drop-in equivalent of models.ref_decoder.apply_inloop_filters, but with all
pixel work running as jitted JAX kernels (ops/loopfilter_tpu, ops/cdef_tpu,
ops/looprestoration_tpu). The host only builds small integer plan arrays
(edge/level maps, cdef index maps, LR stripe-unit batches) from the parsed
headers and entropy state; pixels stay in device arrays across stages.

Mirrors dav1d's pipeline order (src/decode.c filter_sbrow: deblock cols/rows,
cdef, resize, loop restoration) at frame granularity.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..host.lf import build_lf_arrays
from ..ops.ref.loopfilter import calc_eih
from ..ops.loopfilter_tpu import deblock_plane_tpu
from ..ops.cdef_tpu import cdef_frame_tpu
from ..ops.looprestoration_tpu import (wiener_batch_tpu, sgr_batch_tpu,
                                       pad_stripes_tpu)
from ..ops.ref.looprestoration import (LR_HAVE_LEFT, LR_HAVE_RIGHT,
                                       LR_HAVE_TOP, LR_HAVE_BOTTOM,
                                       RESTORATION_WIENER, SGR_PARAMS)


def _prep_lvls(lvl, ci_v, ci_h):
    lv = lvl[:, :, ci_v].astype(np.int32)
    lv_prev = np.zeros_like(lv)
    lv_prev[:, 1:] = lv[:, :-1]
    lh = lvl[:, :, ci_h].astype(np.int32)
    lh_prev = np.zeros_like(lh)
    lh_prev[1:, :] = lh[:-1, :]
    return lv, lv_prev, lh, lh_prev


def build_cdef_plan(fhdr, coders):
    """Host plan for CDEF: per-64x64 index map + 4x4 noskip map."""
    from ..host.tilecoder import T_BLOCK_DIM
    bw4 = coders[0].bw
    bh4 = coders[0].bh
    n64x = (bw4 + 15) >> 4
    n64y = (bh4 + 15) >> 4
    cdef_idx_map = np.full((n64y, n64x), -1, np.int32)
    for coder in coders:
        sb_step = coder.sb_step
        for (bx, by, idxs) in coder.cdef_idx:
            if sb_step == 32:
                for q, v in enumerate(idxs):
                    qx = (bx >> 4) + (q & 1)
                    qy = (by >> 4) + (q >> 1)
                    if qy < n64y and qx < n64x:
                        cdef_idx_map[qy, qx] = v
            else:
                cdef_idx_map[by >> 4, bx >> 4] = idxs[0]
    from .plan_vec import build_cdef_noskip
    noskip = build_cdef_noskip(fhdr, coders)
    return cdef_idx_map, noskip


def _lr_stripe_plan(seq, fhdr, coders, bufs, p):
    """Enumerate LR stripe-units for plane p exactly as the reference driver
    (models.ref_decoder.apply_lr); yields dicts with geometry + params."""
    lr_units = {}
    for coder in coders:
        lr_units.update(coder.lr_units)
    ss_ver = bufs.ss_ver if p else 0
    ss_hor = bufs.ss_hor if p else 0
    hh = (bufs.height + ss_ver) >> ss_ver
    ww = (bufs.width + ss_hor) >> ss_hor
    us_log2 = fhdr.restoration_unit_size[1 if p else 0]
    unit_size = 1 << us_log2
    half = unit_size >> 1
    max_unit = unit_size + half

    y = 0
    while y < hh:
        stripe_h = min((64 - 8 * (y == 0)) >> ss_ver, hh - y)
        row_y = y + ((8 >> ss_ver) if y else 0)
        aligned = row_y & ~(unit_size - 1)
        if aligned and aligned + half > hh:
            aligned -= unit_size
        urow64 = (aligned << ss_ver) >> 6
        edges_base = ((LR_HAVE_TOP if y > 0 else 0) |
                      (LR_HAVE_BOTTOM if y + stripe_h < hh else 0))
        x = 0
        while x < ww:
            if x + max_unit <= ww:
                uw = unit_size
                last = False
            else:
                uw = ww - x
                last = True
            ucol64 = (x << ss_hor) >> 6
            lr = lr_units.get((p, urow64, ucol64))
            if lr is not None and lr["type"] != 0:
                edges = edges_base | \
                    (LR_HAVE_LEFT if x > 0 else 0) | \
                    (0 if last else LR_HAVE_RIGHT)
                yield dict(x=x, y=y, w=uw, h=stripe_h, edges=edges, lr=lr)
            x += uw
        y += stripe_h


def _pad_stripe_np(pre_lr, pre, x, y, w, h, edges, plane_w):
    """Gather the (h+6, w+6) padded input from host copies of the pre-LR
    plane and the pre-CDEF boundary rows (same semantics as
    ops.ref.looprestoration.pad_stripe)."""
    out = np.zeros((h + 6, w + 6), np.int32)
    xs = max(0, x - 3)
    xe = min(x + w + 3, plane_w)
    c0 = 3 - (x - xs)
    c1 = c0 + (xe - xs)
    out[3:3 + h, c0:c1] = pre_lr[y:y + h, xs:xe]
    if edges & LR_HAVE_TOP:
        out[0, c0:c1] = pre[y - 2, xs:xe]
        out[1, c0:c1] = pre[y - 2, xs:xe]
        out[2, c0:c1] = pre[y - 1, xs:xe]
    else:
        out[0] = out[1] = out[2] = out[3]
    if edges & LR_HAVE_BOTTOM:
        out[3 + h, c0:c1] = pre[y + h, xs:xe]
        out[4 + h, c0:c1] = pre[y + h + 1, xs:xe]
        out[5 + h, c0:c1] = pre[y + h + 1, xs:xe]
    else:
        out[3 + h] = out[4 + h] = out[5 + h] = out[2 + h]
    if not (edges & LR_HAVE_LEFT):
        out[:, 0] = out[:, 1] = out[:, 2] = out[:, 3]
    if not (edges & LR_HAVE_RIGHT):
        out[:, w + 3] = out[:, w + 4] = out[:, w + 5] = out[:, w + 2]
    return out


def apply_inloop_filters_tpu(seq, fhdr, coders, bufs, filters_mask=7,
                             defer_download=False):
    """Full TPU in-loop filter chain over bufs.planes (numpy in/out).
    Equivalent to models.ref_decoder.apply_inloop_filters, including the
    debug enable mask and super-resolution (which always runs).  When
    the recon stage left device-resident planes (bufs.dev_planes) the
    chain starts from them — no re-upload; the filtered device planes
    are published back on the returned bufs for future reference reads.

    The whole chain (deblock -> snapshot -> CDEF -> super-res -> LR) is
    packed into one fused program (models/frame_exec plane-input mode):
    one descriptor upload + one dispatch per frame signature on TPU."""
    from .frame_exec import FrameProgram, run_frame_program
    from .tpu_inter import _p2
    from ..ops.mc_tpu import PAD_OOB
    from .ref_decoder import FrameBuffers, _resize_params

    orig_bufs = bufs
    if bufs.dev_planes is not None:
        planes_in = list(bufs.dev_planes)
    else:
        planes_in = [jnp.asarray(p) for p in bufs.planes]
    bd = seq.bitdepth
    prog = FrameProgram(len(planes_in), bd,
                        [tuple(p.shape) for p in planes_in],
                        plane_inputs=True,
                        out_dtype=bufs.planes[0].dtype)

    # ---- deblock ----
    if (filters_mask & 1) and (fhdr.loopfilter_level_y[0] or
                               fhdr.loopfilter_level_y[1]):
        lf = build_lf_arrays(seq, fhdr, coders, bufs.width, bufs.height)
        e_lut, i_lut = calc_eih(fhdr.loopfilter_sharpness)
        # deblock maps are dense per-4x4 frames of tiny values (levels
        # <= 63, edge classes -1..2) — the int8 side quarters this
        # program's dominant upload (the tunnel charges ~100 ms latency
        # + bandwidth per frame). e_lut peaks at 193 (2*(63+2)+63) so
        # it stays on the int16 side; it is 64 entries, noise.
        h_el = prog.emit16(np.asarray(e_lut))
        h_il = prog.emit8(np.asarray(i_lut))
        sb_step4 = 32 if seq.sb128 else 16
        # only lv/lh cross the tunnel; the *_prev neighbour maps are
        # pure shifts, derived on device (interpreter "dbk")
        lv = lf.lvl_y[:, :, 0].astype(np.int8)
        lh_ = lf.lvl_y[:, :, 1].astype(np.int8)
        prog.op("dbk", 0, True, sb_step4, prog.emit8(lf.edge_v_y),
                prog.emit8(lf.edge_h_y), prog.emit8(lv),
                prog.emit8(lh_), h_el, h_il)
        if (len(planes_in) > 1 and
                (fhdr.loopfilter_level_u or fhdr.loopfilter_level_v)):
            h_ev = prog.emit8(lf.edge_v_uv)
            h_eh = prog.emit8(lf.edge_h_uv)
            for pl in (0, 1):
                # chroma v/h share one level channel (see _prep_lvls
                # call sites: ci_v == ci_h == plane index)
                lvc = lf.lvl_uv[:, :, pl].astype(np.int8)
                h_lvc = prog.emit8(lvc)
                prog.op("dbk", 1 + pl, False, sb_step4 >> bufs.ss_ver,
                        h_ev, h_eh, h_lvc, h_lvc, h_el, h_il)

    restore_planes = sum((fhdr.restoration_type[p] != 0) << p
                         for p in range(3)) if (filters_mask & 4) else 0
    if restore_planes:
        prog.op("snap", "precdef")   # boundary-row source for LR

    # ---- CDEF ----
    if (filters_mask & 2) and seq.cdef and \
            (any(fhdr.cdef_y_strength[:1 << fhdr.cdef_n_bits]) or
             any(fhdr.cdef_uv_strength[:1 << fhdr.cdef_n_bits])):
        cdef_idx_map, noskip = build_cdef_plan(fhdr, coders)
        prog.op("cdef", prog.emit8(cdef_idx_map),
                prog.emit8(noskip.astype(np.int8)),
                prog.emit8(np.asarray(fhdr.cdef_y_strength, np.int8)),
                prog.emit8(np.asarray(fhdr.cdef_uv_strength, np.int8)),
                fhdr.cdef_damping + (bd - 8), bufs.ss_hor, bufs.ss_ver,
                seq.layout == 0)

    # ---- super-resolution ----
    if fhdr.width[0] != fhdr.width[1]:
        new_bufs = FrameBuffers(seq, fhdr, width=fhdr.width[1])
        bw4f = ((fhdr.width[0] + 7) >> 3) << 1
        for pl in range(len(planes_in)):
            ss_hor = bufs.ss_hor if pl else 0
            ss_ver = bufs.ss_ver if pl else 0
            in_w = (fhdr.width[0] + ss_hor) >> ss_hor
            out_w = (fhdr.width[1] + ss_hor) >> ss_hor
            step, start = _resize_params(in_w, out_w)
            src_w = (4 * bw4f + ss_hor) >> ss_hor
            h_vis = (fhdr.height + ss_ver) >> ss_ver
            oshape = tuple(new_bufs.planes[pl].shape)
            prog.op("sres", None, pl, out_w, src_w, step, start, h_vis,
                    oshape)
            if restore_planes:
                prog.op("sres", "precdef", pl, out_w, src_w, step,
                        start, h_vis, oshape)
        bufs = new_bufs

    # ---- loop restoration ----
    for p in range(len(planes_in)):
        if not ((restore_planes >> p) & 1):
            continue
        prog.op("snap", ("prelr", p))
        groups = {}
        for u in _lr_stripe_plan(seq, fhdr, coders, bufs, p):
            lr = u["lr"]
            if lr["type"] == RESTORATION_WIENER:
                key = ("wiener", u["w"], u["h"])
            else:
                sgr_idx = lr["type"] - 3
                s0 = int(SGR_PARAMS[sgr_idx][0])
                s1 = int(SGR_PARAMS[sgr_idx][1])
                kind = 2 if (s0 and s1) else (0 if s0 else 1)
                key = ("sgr", kind, u["w"], u["h"])
            groups.setdefault(key, []).append(u)

        for key, units in sorted(groups.items()):
            B = len(units)
            P = _p2(B)
            w, h = key[-2], key[-1]

            def col(f, dtype=np.int32, pad=None):
                v = np.asarray([f(u) for u in units], dtype)
                if P != B:
                    fill = v[-1] if pad is None else pad
                    v = np.concatenate([v, np.full(P - B, fill, dtype)])
                return prog.emit(v)

            h_xs = col(lambda u: u["x"])
            h_ysin = col(lambda u: u["y"])             # gather: in bounds
            h_ysout = col(lambda u: u["y"], pad=PAD_OOB)  # scatter: drop
            h_eg = col(lambda u: u["edges"])
            if key[0] == "wiener":
                def taps(name):
                    f = np.zeros((P, 7), np.int32)
                    for i, u in enumerate(units):
                        f3 = u["lr"][name]
                        f[i, :3] = f3
                        f[i, 4:] = f3[::-1]
                        f[i, 3] = 128 - 2 * (f3[0] + f3[1] + f3[2])
                    f[B:] = f[B - 1]
                    return prog.emit(f)
                prog.op("lrw", p, "precdef", w, h, h_xs, h_ysin,
                        h_ysout, h_eg, taps("filter_h"),
                        taps("filter_v"))
            else:
                skind = key[1]
                h_s0 = col(lambda u: int(
                    SGR_PARAMS[u["lr"]["type"] - 3][0]))
                h_s1 = col(lambda u: int(
                    SGR_PARAMS[u["lr"]["type"] - 3][1]))
                h_w0 = col(lambda u: u["lr"]["sgr_weights"][0])
                h_w1 = col(lambda u: 128 - (u["lr"]["sgr_weights"][0] +
                                            u["lr"]["sgr_weights"][1]))
                prog.op("lrs", p, "precdef", skind, w, h, h_xs, h_ysin,
                        h_ysout, h_eg, h_s0, h_s1, h_w0, h_w1)

    prog.op("out")   # native-dtype planes: 4x smaller downloads/refs
    if defer_download:
        prog.op("outpack")   # one flat buffer = one tunnel round-trip
    from ..utils.trace import trace_scope
    with trace_scope("filters.dispatch"):
        planes, _ = run_frame_program(prog, tuple(planes_in))
    packed = None
    if defer_download:
        planes, packed = planes[:-1], planes[-1]
    import os as _os
    if _os.environ.get("DAV1D_TPU_SYNC_TRACE"):
        with trace_scope("filters.device-wait"):
            for p in planes:
                p.block_until_ready()
    if orig_bufs is not bufs:
        # super-res rebound `bufs`; the (possibly donated) input buffers
        # on the original FrameBuffers are dead — no dangling refs
        orig_bufs.dev_planes = None
    for p in (planes if packed is None else [packed]):
        try:
            p.copy_to_host_async()
        except Exception:
            break
    bufs.dev_planes = list(planes)
    if defer_download:
        # stage-split pipelining (api._decode_frame): the ~30 MB/s
        # tunnel download of the output planes runs on the gather
        # stage, overlapped with the NEXT frame's dispatch/compute —
        # device-side consumers (the next frame's ref binds) only need
        # dev_planes, which are already published above. The download
        # itself is ONE packed flat buffer (outpack): the tunnel pays a
        # fixed round-trip per transfer, so per-plane pulls tripled it.
        bufs._pending_dl = packed
        return bufs
    with trace_scope("filters.download"):
        for i, p in enumerate(planes):
            bufs.planes[i] = np.asarray(p).astype(bufs.planes[i].dtype)
    return bufs


def cdef_banded(mesh, seq, fhdr, bufs, planes, cdef_idx_map, noskip):
    """CDEF with the per-pixel filter row-band-sharded over the mesh
    (parallel/filter_shard.band_cdef_plane): the per-8x8 direction and
    strength maps are derived exactly as in ops/cdef_tpu.cdef_frame_tpu,
    then each plane filters its bands with a 2-row ppermute halo."""
    from ..ops.cdef_tpu import (cdef_dir_tpu, adjust_strength_v,
                                UV_DIRS_TBL)
    from ..parallel.filter_shard import band_cdef_plane
    import jax.numpy as jnp

    bitdepth = seq.bitdepth
    bd_m8 = bitdepth - 8
    damping = fhdr.cdef_damping + bd_m8
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    monochrome = seq.layout == 0
    bh4, bw4 = noskip.shape
    h8, w8 = (bh4 + 1) // 2, (bw4 + 1) // 2

    idx8 = np.repeat(np.repeat(np.asarray(cdef_idx_map), 8, 0), 8, 1)
    idx8 = idx8[:h8, :w8]
    ns = np.asarray(noskip)
    if bh4 % 2 or bw4 % 2:
        ns = np.pad(ns, ((0, bh4 % 2), (0, bw4 % 2)))
    ns8 = ns.reshape(h8, 2, w8, 2).any(axis=(1, 3))
    valid = (idx8 >= 0) & ns8
    sel = np.maximum(idx8, 0)
    y_lvl = np.asarray(fhdr.cdef_y_strength, np.int32)[sel]
    uv_lvl = np.asarray(fhdr.cdef_uv_strength, np.int32)[sel]
    valid = valid & ((y_lvl > 0) | (uv_lvl > 0))
    y_pri = (y_lvl >> 2) << bd_m8
    y_sec0 = y_lvl & 3
    y_sec = (y_sec0 + (y_sec0 == 3)) << bd_m8
    uv_pri = (uv_lvl >> 2) << bd_m8
    uv_sec0 = uv_lvl & 3
    uv_sec = (uv_sec0 + (uv_sec0 == 3)) << bd_m8

    dirm, varm = cdef_dir_tpu(jnp.asarray(planes[0], jnp.int32), h8, w8,
                              bitdepth)
    dirm = np.asarray(dirm)
    y_adj = np.asarray(adjust_strength_v(jnp.asarray(y_pri), varm))
    pri_map = np.where(y_pri > 0, y_adj, 0)
    dir_y = np.where(y_pri > 0, dirm, 0)
    act_y = valid & (y_lvl > 0)
    out = [band_cdef_plane(mesh, np.asarray(planes[0], np.int32), dir_y,
                           pri_map, np.where(act_y, y_sec, 0), damping,
                           act_y, bitdepth, 8, 8)]
    if not monochrome and len(planes) > 1:
        uvd = UV_DIRS_TBL[1 if (ss_hor and not ss_ver) else 0]
        dir_uv = np.where(uv_pri > 0, uvd[dirm], 0)
        act_uv = valid & (uv_lvl > 0)
        for pl in (1, 2):
            out.append(band_cdef_plane(
                mesh, np.asarray(planes[pl], np.int32), dir_uv,
                np.where(act_uv, uv_pri, 0),
                np.where(act_uv, uv_sec, 0), damping - 1, act_uv,
                bitdepth, 8 >> ss_hor, 8 >> ss_ver))
    else:
        out.extend(planes[1:])
    return out
