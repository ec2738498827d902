"""End-to-end sharded decode of a real multi-tile frame over a mesh.

The reference schedules per-tile-sbrow tasks over a worker pool (dav1d
src/thread_task.c:268-310); here the tile rows of a frame become the
mesh shard axis:

  * reconstruction (the wavefront intra engine, models/tpu_intra) runs
    under one `shard_map` — tile rows are fully independent for
    entropy AND prediction (edges never cross tile starts), so the scan
    is embarrassingly parallel with zero collectives;
  * the in-loop filters DO cross tile boundaries, so they run as the
    row-band sharded passes with `ppermute` halo exchange
    (parallel/filter_shard): deblock H edges exchange an 8-row halo +
    write-back delta, CDEF a 2-row halo, LR shards its stripe batch.

Bit-exact with the single-device decode (and therefore with the
reference binary); validated on the 8-virtual-device CPU mesh the
driver uses for multi-chip checks (`__graft_entry__.dryrun_multichip`
drives exactly this path on a generated multi-tile stream).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..host import headers as h
from ..data.tables import TABLES
from ..models.tpu_intra import (IntraPlan, build_intra_plan,
                                intra_scan_impl, _round_up)
from ..ops import ipred_tpu as ipt
from ..ops.ipred_tpu import PAD, PADT, NPARAMS
from ..ops.itx import itx_residual

T_BLOCK_DIM = TABLES["block_dimensions"]


def _band_assembly(seq, fhdr, coder, band_y0px, band_x0px=0):
    """Per-tile plan + init/residual band planes (host side).
    band_y0px/band_x0px: the tile's top-left in luma pixels; all
    P_PY/P_PX/P_BPY/P_BPX/P_YSRC coordinates are rebased so the tile
    slab is self-contained (tile-column sharding = nonzero x0)."""
    bitdepth = seq.bitdepth
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    n_planes = 1 if seq.layout == h.PIXEL_LAYOUT_I400 else 3
    bw = coder.bw
    band_h4 = coder.row_end - coder.row_start
    band_w4 = coder.col_end - coder.col_start
    Hb = band_h4 * 4 + PADT + PAD
    Wb = band_w4 * 4 + PADT + PAD
    cy0 = band_y0px >> ss_ver
    cx0 = band_x0px >> ss_hor

    ch_w = (bw + ss_hor) >> ss_hor
    ch_full = ((coder.bh + ss_ver) >> ss_ver)

    done = [np.zeros((coder.bh, bw), np.int32),
            np.zeros((ch_full, ch_w), np.int32),
            np.zeros((ch_full, ch_w), np.int32)]
    plan = IntraPlan()
    build_intra_plan(seq, fhdr, coder, done, plan)

    def rebase(items):
        for pv, _ in items:
            y0 = band_y0px if pv[ipt.P_PLANE] == 0 else cy0
            x0 = band_x0px if pv[ipt.P_PLANE] == 0 else cx0
            pv[ipt.P_PY] -= y0
            pv[ipt.P_BPY] -= y0
            pv[ipt.P_YSRC_Y] -= band_y0px
            pv[ipt.P_PX] -= x0
            pv[ipt.P_BPX] -= x0
            pv[ipt.P_YSRC_X] -= band_x0px

    rebase(plan.items)
    rebase(plan.filter_items)
    main_plan, filt_plan, _ = plan.finalize()

    # palette pre-placement + residual bands
    init = [np.zeros((Hb, Wb), np.int32) for _ in range(n_planes)]
    res = [np.zeros((Hb, Wb), np.int32) for _ in range(n_planes)]
    for b in coder.blocks:
        if not b.intra or not (b.pal_sz[0] or b.pal_sz[1]):
            continue
        b_dim = T_BLOCK_DIM[b.bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        if b.pal_sz[0]:
            py = 4 * b.by - band_y0px + PADT
            px = 4 * b.bx - band_x0px + PADT
            init[0][py:py + bh4 * 4, px:px + bw4 * 4] = \
                np.asarray(b.pal[0], np.int64)[b.pal_idx_y]
        if b.pal_sz[1] and n_planes > 1 and \
                (bw4 > ss_hor or b.bx & 1) and (bh4 > ss_ver or b.by & 1):
            cbw4 = (bw4 + ss_hor) >> ss_hor
            cbh4 = (bh4 + ss_ver) >> ss_ver
            py = 4 * (b.by >> ss_ver) - cy0 + PADT
            px = 4 * (b.bx >> ss_hor) - cx0 + PADT
            for pl in (1, 2):
                init[pl][py:py + cbh4 * 4, px:px + cbw4 * 4] = \
                    np.asarray(b.pal[pl], np.int64)[b.pal_idx_uv]

    buckets = {}
    for cb in coder.coefs:
        if cb.eob < 0:
            continue
        buckets.setdefault((cb.plane, cb.tx, cb.txtp), []).append(cb)
    for (pl, tx, txtp), lst in sorted(buckets.items()):
        cfs = jnp.asarray(np.stack([e.cf for e in lst]).astype(np.int32))
        r = np.asarray(itx_residual(cfs, tx, txtp, bitdepth))
        y0 = band_y0px if pl == 0 else cy0
        x0 = band_x0px if pl == 0 else cx0
        for i, e in enumerate(lst):
            py = e.y * 4 - y0 + PADT
            px = e.x * 4 - x0 + PADT
            res[pl][py:py + r.shape[1], px:px + r.shape[2]] = r[i]

    return main_plan, filt_plan, init, res


def _tile_grid(fhdr, coders, n):
    """(rows, cols, band_h4, band_w4): the uniform R x C tile grid the
    mesh shards over (one tile per device, raster order)."""
    t = fhdr.tiling
    assert t.cols * t.rows == n, \
        f"need {n} tiles total, have {t.rows}x{t.cols}"
    band_h4s = {c.row_end - c.row_start for c in coders}
    band_w4s = {c.col_end - c.col_start for c in coders}
    assert len(band_h4s) == 1 and len(band_w4s) == 1, \
        "tiles must be uniform"
    return t.rows, t.cols, band_h4s.pop(), band_w4s.pop()


def _stitch_tiles(out, n_planes, rows, cols, band_h4, band_w4, ss_hor,
                  ss_ver, bufs, crop_padt=True):
    """Assemble per-tile slabs (n, Hs, Ws) back into full planes.
    Chroma content occupies the top-left of each luma-sized slab."""
    planes = []
    for i in range(n_planes):
        ssv = ss_ver if i else 0
        ssh = ss_hor if i else 0
        bh_px = band_h4 * 4 >> ssv
        bw_px = band_w4 * 4 >> ssh
        o = np.asarray(out[i])
        if crop_padt:
            o = o[:, PADT:PADT + band_h4 * 4, PADT:PADT + band_w4 * 4]
        full = np.concatenate(
            [np.concatenate([o[r * cols + c][:bh_px, :bw_px]
                             for c in range(cols)], axis=1)
             for r in range(rows)], axis=0)
        ph, pw = bufs.planes[i].shape
        buf = np.zeros((ph, pw), np.int32)
        ch = min(ph, full.shape[0])
        cw = min(pw, full.shape[1])
        buf[:ch, :cw] = full[:ch, :cw]
        planes.append(buf)
    return planes


def sharded_intra_decode(seq, fhdr, coders, mesh: Mesh, bufs):
    """Decode an intra multi-tile frame with the R x C tile grid sharded
    over the mesh (one tile per device, raster order — tiles are fully
    independent for entropy and prediction), then the band-sharded
    filter chain. Fills bufs.planes."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    rows, cols, band_h4, band_w4 = _tile_grid(fhdr, coders, n)
    bitdepth = seq.bitdepth
    ss_hor = bufs.ss_hor
    ss_ver = bufs.ss_ver
    n_planes = len(bufs.planes)

    mains, filts, inits, ress = [], [], [], []
    for r, coder in enumerate(coders):
        m, f, init, res = _band_assembly(seq, fhdr, coder,
                                         coder.row_start * 4,
                                         coder.col_start * 4)
        mains.append(m)
        filts.append(f)
        inits.append(init)
        ress.append(res)

    # pad plan shapes uniform across bands
    nw = _round_up(max(m.shape[0] for m in mains), 16)
    km = _round_up(max(m.shape[1] for m in mains), 16)
    kf = _round_up(max(max(f.shape[1] for f in filts), 1), 8)
    mp = np.zeros((n, nw, km, NPARAMS), np.int32)
    fp = np.zeros((n, nw, kf, NPARAMS), np.int32)
    for r in range(n):
        mp[r, :mains[r].shape[0], :mains[r].shape[1]] = mains[r]
        fp[r, :filts[r].shape[0], :filts[r].shape[1]] = filts[r]

    planes_in = [np.stack([inits[r][i] for r in range(n)])
                 for i in range(n_planes)]
    res_in = [np.stack([ress[r][i] for r in range(n)])
              for i in range(n_planes)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tuple(P(axis) for _ in range(n_planes)),
                  tuple(P(axis) for _ in range(n_planes)),
                  P(axis), P(axis)),
        out_specs=tuple(P(axis) for _ in range(n_planes)))
    def recon_band(planes, res, m, f):
        planes = tuple(p[0] for p in planes)
        res = tuple(p[0] for p in res)
        out = intra_scan_impl(planes, res, m[0], f[0], bitdepth, ss_hor,
                              ss_ver, n_planes)
        return tuple(p[None] for p in out)

    out = recon_band(tuple(jnp.asarray(p) for p in planes_in),
                     tuple(jnp.asarray(p) for p in res_in),
                     jnp.asarray(mp), jnp.asarray(fp))

    planes = _stitch_tiles(out, n_planes, rows, cols, band_h4, band_w4,
                           ss_hor, ss_ver, bufs)
    planes = banded_inloop_filters(mesh, seq, fhdr, coders, bufs, planes)

    for i in range(n_planes):
        bufs.planes[i][...] = planes[i].astype(bufs.planes[i].dtype)
    return bufs


def sharded_inter_decode(seq, fhdr, coders, mesh: Mesh, bufs, refs,
                         jnt_weights=None):
    """Decode an INTER multi-tile frame with the R x C tile grid sharded
    over the mesh (BASELINE config-4's inter leg):

      * reference planes are REPLICATED onto every shard (the
        multi-chip residency model — MVs may point anywhere in the ref,
        so each chip keeps the full previous-frame planes; dav1d's
        analogue is the shared address space its frame threads read
        ref rows from, thread_task.c:403-431);
      * each shard runs its tile's 8-tap MC unit batches, compound
        avg/weighted-avg joins + the type-as-data residual scatter
        under ONE shard_map (zero collectives — tiles are independent);
      * the in-loop filters cross tile boundaries and run as the
        band-sharded passes with ppermute halo exchange.

    Scope: translational blocks — single-ref (incl. sub-8x8 chroma
    quadrants) and compound AVG / weighted-AVG. Warp/OBMC/masked
    compound raise — the single-chip fused program owns those.
    refs: 7-slot list of FrameBuffers (int planes). Fills bufs.planes,
    bit-exact with the single-device decode."""
    from ..models.tpu_inter import (_units_for_block_raw, _pad_rows,
                                    _pad_vec, _p2)
    from ..models.frame_exec import _resid_scatter_multi
    from ..ops.mc_tpu import (mc_unit_batch, scatter_units, set_slots,
                              comp_join_wavg, PAD_OOB)
    from ..ops.itx import itx_multi_sel
    from ..ops.itx_meta import TX_INFO, WHT_WHT
    from ..host.tilecoder import (COMP_INTER_NONE, COMP_INTER_AVG,
                                  COMP_INTER_WEIGHTED_AVG)

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    rows_n, cols_n, band_h4, band_w4 = _tile_grid(fhdr, coders, n)
    bitdepth = seq.bitdepth
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    n_planes = len(bufs.planes)
    plane_shapes = [((band_h4 * 4) >> (ss_ver if pl else 0),
                     (band_w4 * 4) >> (ss_hor if pl else 0))
                    for pl in range(n_planes)]

    # --- per-tile planning (host): translational puts + compound +
    # residuals ---
    put_bands = [[dict() for _ in range(n_planes)] for _ in range(n)]
    comp_bands = [dict() for _ in range(n)]
    res_bands = [dict() for _ in range(n)]
    # ONE frame-wide decode-order filter map (coders iterate in tile
    # raster order, which IS bitstream decode order for any tiling) —
    # per-band maps would read 0 instead of the previous tile's
    # filter2d for sub-8x8 chroma at a tile's top row, diverging from
    # the single-device path (models/tpu_inter.py:404)
    f2d_map = np.zeros((coders[0].bh, coders[0].bw), np.uint8)
    tl_f2d = 0
    for r, coder in enumerate(coders):
        rf = coder.rf
        band_y0 = coder.row_start * 4
        band_x0 = coder.col_start * 4
        cy0 = band_y0 >> ss_ver
        cx0 = band_x0 >> ss_hor
        for b in coder.blocks:
            b_dim = T_BLOCK_DIM[b.bs]
            bw4, bh4 = int(b_dim[0]), int(b_dim[1])
            bx, by = b.bx, b.by
            comp_ok = b.comp_type in (COMP_INTER_AVG,
                                      COMP_INTER_WEIGHTED_AVG) and \
                not b.motion_mode and not b.interintra_type
            if comp_ok and b.inter_mode == 6:   # GLOBALMV_GLOBALMV
                from ..models.ref_decoder import _gmv_warp_params
                comp_ok = all(
                    _gmv_warp_params(fhdr, b.ref[i], False) is None
                    for i in (0, 1))
            if b.intra or b.motion_mode or \
                    (b.comp_type and not comp_ok) or (
                    not b.comp_type and
                    b.inter_mode == 2 and          # GLOBALMV with a
                    fhdr.gmv[b.ref[0]].type > 1 and  # warping gm model
                    min(bw4, bh4) > 1):  # 4px-narrow GLOBALMV is
                #                          translational (tpu_inter:435)
                raise ValueError("sharded_inter_decode: translational "
                                 "single-ref/avg-compound blocks only")
            has_chroma = (n_planes > 1 and
                          (bw4 > ss_hor or bx & 1) and
                          (bh4 > ss_ver or by & 1))
            if b.comp_type:
                # compound avg/wavg: whole-block sides per plane
                # (compound needs bs >= 8x8, so no sub-8x8 chroma)
                w = 8
                if b.comp_type == COMP_INTER_WEIGHTED_AVG:
                    w = jnt_weights[b.ref[0]][b.ref[1]]
                for pl in range(n_planes):
                    ssh = ss_hor if pl else 0
                    ssv = ss_ver if pl else 0
                    if pl and not has_chroma:
                        continue
                    bwp = (bw4 * 4) >> ssh
                    bhp = (bh4 * 4) >> ssv
                    sides = []
                    for i in (0, 1):
                        tmp = {}
                        _units_for_block_raw(
                            tmp, pl, ss_hor, ss_ver, (bw4, bh4), bx,
                            by, b.mv[i], b.ref[i], b.filter2d,
                            whole=True)
                        (k2, l2), = tmp.items()
                        sides.append((l2[0][:6], k2[2], k2[3]))
                    comp_bands[r].setdefault((pl, bwp, bhp), []).append(
                        (sides, w,
                         (by * 4 - band_y0) >> ssv,
                         (bx * 4 - band_x0) >> ssh))
                f2d_map[by:by + bh4, bx:bx + bw4] = b.filter2d
                continue
            _units_for_block_raw(put_bands[r][0], 0, 0, 0, (bw4, bh4),
                                 bx, by, b.mv[0], b.ref[0], b.filter2d,
                                 dst=(by * 4 - band_y0,
                                      bx * 4 - band_x0))
            if has_chroma:
                is_sub8x8 = bw4 == ss_hor or bh4 == ss_ver
                if is_sub8x8:
                    if bw4 == 1:
                        is_sub8x8 &= rf.ref[by, bx - 1, 0] > 0
                    if bh4 == ss_ver:
                        is_sub8x8 &= rf.ref[by - 1, bx, 0] > 0
                    if bw4 == 1 and bh4 == ss_ver:
                        is_sub8x8 &= rf.ref[by - 1, bx - 1, 0] > 0
                if is_sub8x8:
                    # neighbour-MV chroma quadrants (recon_tmpl.c:1703)
                    uvx = (bx >> ss_hor) * 4 - cx0
                    uvy = (by >> ss_ver) * 4 - cy0
                    h_off = v_off = 0

                    def sub_mc(cy, cx, dyo, dxo, f2d_val):
                        rref = int(rf.ref[cy, cx, 0]) - 1
                        rmv = (int(rf.mv[cy, cx, 0, 0]),
                               int(rf.mv[cy, cx, 0, 1]))
                        for pl in (1, 2):
                            _units_for_block_raw(
                                put_bands[r][pl], pl, ss_hor, ss_ver,
                                (bw4, bh4), cx, cy, rmv, rref, f2d_val,
                                dst=(uvy + dyo, uvx + dxo))

                    if bw4 == 1 and bh4 == ss_ver:
                        sub_mc(by - 1, bx - 1, 0, 0, tl_f2d)
                        v_off, h_off = 2, 2
                    if bw4 == 1:
                        sub_mc(by, bx - 1, v_off, 0,
                               int(f2d_map[by, bx - 1]))
                        h_off = 2
                    if bh4 == ss_ver:
                        sub_mc(by - 1, bx, 0, h_off,
                               int(f2d_map[by - 1, bx]))
                        v_off = 2
                    for pl in (1, 2):
                        _units_for_block_raw(
                            put_bands[r][pl], pl, ss_hor, ss_ver,
                            (bw4, bh4), bx, by, b.mv[0], b.ref[0],
                            b.filter2d, dst=(uvy + v_off, uvx + h_off))
                else:
                    for pl in (1, 2):
                        _units_for_block_raw(
                            put_bands[r][pl], pl, ss_hor, ss_ver,
                            (bw4 << (bw4 == ss_hor),
                             bh4 << (bh4 == ss_ver)),
                            bx & ~ss_hor, by & ~ss_ver, b.mv[0],
                            b.ref[0], b.filter2d,
                            dst=(((by & ~ss_ver) * 4 >> ss_ver) - cy0,
                                 ((bx & ~ss_hor) * 4 >> ss_hor) - cx0))
            tl_f2d = b.filter2d
            f2d_map[by:by + bh4, bx:bx + bw4] = b.filter2d
        for cb in coder.coefs:
            if cb.eob < 0:
                continue
            assert cb.txtp != WHT_WHT
            y0 = band_y0 if cb.plane == 0 else cy0
            x0 = band_x0 if cb.plane == 0 else cx0
            res_bands[r].setdefault((cb.plane, cb.tx), []).append(
                (cb.cf, cb.y * 4 - y0, cb.x * 4 - x0,
                 itx_multi_sel(cb.tx, cb.txtp)))

    # --- uniform packing across bands (the shard axis) ---
    put_keys = sorted({(pl, k) for pb in put_bands
                       for pl in range(n_planes) for k in pb[pl]})
    put_data = []
    for pl, k in put_keys:
        padn = _p2(max(max((len(pb[pl].get(k, []))
                            for pb in put_bands)), 1))
        arrs = []
        for pb in put_bands:
            lst = pb[pl].get(k) or \
                [(0, 0, 0, 8 * bool(k[2]), 8 * bool(k[3]), 0, PAD_OOB,
                  0)]
            arrs.append(_pad_rows(np.asarray(lst, np.int32), 6, padn))
        put_data.append(jnp.asarray(np.stack(arrs)))
    # compound buckets: uniform (Np, ...) packing across tiles. Slot
    # Np-1 is sacrificial (pad sides set_slots into it; pad dsts are
    # OOB so the scatter drops the whole slot).
    comp_keys = sorted({k for cb in comp_bands for k in cb})
    comp_data = []
    comp_meta = []
    for key in comp_keys:
        pl, bwp, bhp = key
        Np = _p2(max(max((len(cb.get(key, [])) for cb in comp_bands)),
                     1) + 1)
        srows = np.zeros((n, 2, Np, 6), np.int32)
        shh = np.zeros((n, 2, Np), bool)
        shv = np.zeros((n, 2, Np), bool)
        wts = np.full((n, Np), 8, np.int32)
        dys = np.full((n, Np), PAD_OOB, np.int32)
        dxs = np.zeros((n, Np), np.int32)
        for r, cb in enumerate(comp_bands):
            for i, (sides, w, dy, dx) in enumerate(cb.get(key, [])):
                for si, (row6, hh, hv) in enumerate(sides):
                    srows[r, si, i] = row6
                    shh[r, si, i] = hh
                    shv[r, si, i] = hv
                wts[r, i] = w
                dys[r, i] = dy
                dxs[r, i] = dx
        # per-(side, hh, hv) sub-batches with slot lists, uniform
        # across tiles: every slot appears in exactly one sub-batch per
        # side; absent combos point every slot at the sacrificial pad
        subs = []          # (si, hh, hv) -> (rows (n,Ps,6), slots)
        for si in (0, 1):
            for hh in (False, True):
                for hv in (False, True):
                    sel = [np.nonzero((shh[r, si] == hh) &
                                      (shv[r, si] == hv))[0]
                           for r in range(n)]
                    mx = max(max(len(s) for s in sel), 1)
                    Ps = _p2(mx)
                    rr = np.zeros((n, Ps, 6), np.int32)
                    sl = np.full((n, Ps), Np - 1, np.int32)
                    any_real = False
                    for r in range(n):
                        s = sel[r]
                        if len(s):
                            any_real = True
                            rr[r, :len(s)] = srows[r, si, s]
                            sl[r, :len(s)] = s
                            # pad lanes re-target the sacrificial slot
                            rr[r, len(s):] = rr[r, max(len(s) - 1, 0)]
                    if not any_real:
                        continue
                    subs.append((si, hh, hv, jnp.asarray(rr),
                                 jnp.asarray(sl)))
        # static meta ((si, hh, hv) per sub) apart from the array pytree
        # (shard_map specs must mirror the arrays only)
        comp_meta.append((key, tuple(s[:3] for s in subs)))
        comp_data.append(tuple(
            [a for s in subs for a in s[3:]] +
            [jnp.asarray(wts), jnp.asarray(dys), jnp.asarray(dxs)]))
    res_keys = sorted({k for rb in res_bands for k in rb})
    res_data = []
    for k in res_keys:
        pl, tx = k
        w_t, h_t, _ = TX_INFO[tx]
        sh, sw = min(h_t, 32), min(w_t, 32)
        padn = _p2(max(max((len(rb.get(k, []))
                            for rb in res_bands)), 1))
        cf = np.zeros((n, padn, sh, sw), np.int32)
        ys = np.full((n, padn), PAD_OOB, np.int32)
        xs = np.zeros((n, padn), np.int32)
        sel = np.zeros((n, padn, 2), np.int32)
        for r, rb in enumerate(res_bands):
            for i, (c, y, x, s) in enumerate(rb.get(k, [])):
                cf[r, i] = c
                ys[r, i] = y
                xs[r, i] = x
                sel[r, i] = s
        res_data.append((jnp.asarray(cf), jnp.asarray(ys),
                         jnp.asarray(xs), jnp.asarray(sel)))

    # replicated reference stacks per plane (7 slots; absent -> zeros).
    # Shapes MUST match the single-device path's ref planes — the
    # VISIBLE dims (tpu_inter.py:714 refspec), not the sb-aligned padded
    # planes: MC windows past the frame edge clamp to the last visible
    # row/col, and a padded slab would hand them pad pixels instead.
    ref_stacks = []
    for pl in range(n_planes):
        sh_p = ss_hor if pl else 0
        sv_p = ss_ver if pl else 0
        wv = (bufs.width + sh_p) >> sh_p
        hv = (bufs.height + sv_p) >> sv_p
        slabs = []
        for i in range(7):
            rb = refs[fhdr.refidx[i]]
            if rb is None:
                slabs.append(np.zeros((hv, wv), np.int32))
            else:
                assert (rb.width, rb.height) == (bufs.width,
                                                 bufs.height), \
                    "sharded_inter_decode: scaled refs unsupported"
                slabs.append(
                    np.asarray(rb.planes[pl][:hv, :wv], np.int32))
        ref_stacks.append(jnp.asarray(np.stack(slabs)))

    in_specs = (tuple(P(None) for _ in range(n_planes)),
                tuple(P(axis) for _ in put_data),
                tuple(tuple(P(axis) for _ in c) for c in comp_data),
                tuple((P(axis),) * 4 for _ in res_data))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=in_specs,
        out_specs=tuple(P(axis) for _ in range(n_planes)))
    def recon_band(refstk, puts, comps, ress):
        planes = [jnp.zeros((1,) + plane_shapes[pl], jnp.int32)
                  for pl in range(n_planes)]
        for (pl, k), arr in zip(put_keys, puts):
            uw, uh, hh, hv = k
            a = arr[0]
            out = mc_unit_batch(
                (refstk[pl], a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                 a[:, 4], a[:, 5]), uw, uh, bool(hh), bool(hv),
                bitdepth, False)
            planes[pl] = planes[pl].at[0].set(scatter_units(
                planes[pl][0], out, a[:, 6], a[:, 7], uh, uw))
        for (key, submeta), arrs in zip(comp_meta, comps):
            pl, bwp, bhp = key
            wts, dys, dxs = arrs[-3], arrs[-2], arrs[-1]
            Np = wts.shape[1]
            tmps = [jnp.zeros((Np, bhp, bwp), jnp.int32)
                    for _ in (0, 1)]
            for j, (si, hh, hv) in enumerate(submeta):
                rr, sl = arrs[2 * j][0], arrs[2 * j + 1][0]
                outm = mc_unit_batch(
                    (refstk[pl], rr[:, 0], rr[:, 1], rr[:, 2],
                     rr[:, 3], rr[:, 4], rr[:, 5]), bwp, bhp,
                    bool(hh), bool(hv), bitdepth, True)
                tmps[si] = set_slots(tmps[si], sl, outm)
            joined = comp_join_wavg(
                jnp.zeros((Np, bhp, bwp), jnp.int32), tmps[0], tmps[1],
                jnp.arange(Np), wts[0][:, None, None], bitdepth)
            planes[pl] = planes[pl].at[0].set(scatter_units(
                planes[pl][0], joined, dys[0], dxs[0], bhp, bwp))
        for (pl, tx), (cf, ys, xs, sel) in zip(res_keys, ress):
            planes[pl] = planes[pl].at[0].set(_resid_scatter_multi(
                planes[pl][0], cf[0], sel[0, :, 0], sel[0, :, 1],
                ys[0], xs[0], tx, bitdepth))
        return tuple(planes)

    out = recon_band(tuple(ref_stacks), tuple(put_data),
                     tuple(comp_data), tuple(res_data))

    planes = _stitch_tiles(out, n_planes, rows_n, cols_n, band_h4,
                           band_w4, ss_hor, ss_ver, bufs,
                           crop_padt=False)
    planes = banded_inloop_filters(mesh, seq, fhdr, coders, bufs,
                                   planes)
    for i in range(n_planes):
        bufs.planes[i][...] = planes[i].astype(bufs.planes[i].dtype)
    return bufs


def banded_inloop_filters(mesh, seq, fhdr, coders, bufs, planes):
    """Band-sharded deblock + CDEF with ppermute halo exchange over the
    mesh (shared by the sharded intra and inter decodes)."""
    from ..models import tpu_filters as tf
    from ..models.tpu_filters import build_cdef_plan
    from ..host.lf import build_lf_arrays
    from ..ops.ref.loopfilter import calc_eih
    from .filter_shard import band_deblock_plane

    bitdepth = seq.bitdepth
    n_planes = len(planes)
    if fhdr.loopfilter_level_y[0] or fhdr.loopfilter_level_y[1]:
        lf = build_lf_arrays(seq, fhdr, coders, bufs.width, bufs.height)
        e_lut, i_lut = calc_eih(fhdr.loopfilter_sharpness)
        e_lut = np.asarray(e_lut)
        i_lut = np.asarray(i_lut)
        lv, lvp, lh_, lhp = tf._prep_lvls(lf.lvl_y, 0, 1)
        planes[0] = band_deblock_plane(
            mesh, planes[0], lf.edge_v_y, lf.edge_h_y, lv, lvp, lh_, lhp,
            e_lut, i_lut, True, bitdepth)
        if n_planes > 1 and (fhdr.loopfilter_level_u or
                             fhdr.loopfilter_level_v):
            for pl in (0, 1):
                lv, lvp, lh_, lhp = tf._prep_lvls(lf.lvl_uv, pl, pl)
                planes[1 + pl] = band_deblock_plane(
                    mesh, planes[1 + pl], lf.edge_v_uv, lf.edge_h_uv,
                    lv, lvp, lh_, lhp, e_lut, i_lut, False, bitdepth)

    if seq.cdef and (any(fhdr.cdef_y_strength[:1 << fhdr.cdef_n_bits]) or
                     any(fhdr.cdef_uv_strength[:1 << fhdr.cdef_n_bits])):
        # per-plane direction/strength maps from the single-device plan,
        # then the banded filter with 2-row halos
        cdef_idx_map, noskip = build_cdef_plan(fhdr, coders)
        planes = tf.cdef_banded(mesh, seq, fhdr, bufs, planes,
                                cdef_idx_map, noskip)
    return planes
