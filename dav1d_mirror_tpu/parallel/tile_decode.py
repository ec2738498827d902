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


def _band_assembly(seq, fhdr, coder, band_y0px):
    """Per-tile-row plan + init/residual band planes (host side).
    band_y0px: the band's top in luma pixels; all P_PY/P_BPY/P_YSRC_Y
    coordinates are rebased so the band is self-contained."""
    bitdepth = seq.bitdepth
    ss_hor = 1 if seq.layout != h.PIXEL_LAYOUT_I444 else 0
    ss_ver = 1 if seq.layout == h.PIXEL_LAYOUT_I420 else 0
    n_planes = 1 if seq.layout == h.PIXEL_LAYOUT_I400 else 3
    bw = coder.bw
    band_h4 = coder.row_end - coder.row_start
    Hb = band_h4 * 4 + PADT + PAD
    Wb = bw * 4 + PADT + PAD
    cy0 = band_y0px >> ss_ver

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
            pv[ipt.P_PY] -= y0
            pv[ipt.P_BPY] -= y0
            pv[ipt.P_YSRC_Y] -= band_y0px

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
            px = 4 * b.bx + PADT
            init[0][py:py + bh4 * 4, px:px + bw4 * 4] = \
                np.asarray(b.pal[0], np.int64)[b.pal_idx_y]
        if b.pal_sz[1] and n_planes > 1 and \
                (bw4 > ss_hor or b.bx & 1) and (bh4 > ss_ver or b.by & 1):
            cbw4 = (bw4 + ss_hor) >> ss_hor
            cbh4 = (bh4 + ss_ver) >> ss_ver
            py = 4 * (b.by >> ss_ver) - cy0 + PADT
            px = 4 * (b.bx >> ss_hor) + PADT
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
        for i, e in enumerate(lst):
            py = e.y * 4 - y0 + PADT
            px = e.x * 4 + PADT
            res[pl][py:py + r.shape[1], px:px + r.shape[2]] = r[i]

    return main_plan, filt_plan, init, res


def sharded_intra_decode(seq, fhdr, coders, mesh: Mesh, bufs):
    """Decode an intra multi-tile-row frame with tile rows sharded over
    the mesh, then the band-sharded filter chain. Fills bufs.planes."""
    from ..models import tpu_filters as tf
    from ..models.tpu_filters import build_cdef_plan
    from ..host.lf import build_lf_arrays
    from ..ops.ref.loopfilter import calc_eih
    from .filter_shard import band_deblock_plane, band_cdef_plane

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    t = fhdr.tiling
    assert t.cols == 1 and t.rows == n, \
        f"need {n} tile rows x 1 col, have {t.rows}x{t.cols}"
    band_h4s = {c.row_end - c.row_start for c in coders}
    assert len(band_h4s) == 1, "tile rows must be uniform"
    band_h4 = band_h4s.pop()
    bitdepth = seq.bitdepth
    ss_hor = bufs.ss_hor
    ss_ver = bufs.ss_ver
    n_planes = len(bufs.planes)
    bw = coders[0].bw

    mains, filts, inits, ress = [], [], [], []
    for r, coder in enumerate(coders):
        m, f, init, res = _band_assembly(seq, fhdr, coder,
                                         coder.row_start * 4)
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

    # stitch bands into full-frame planes (strip per-band padding)
    planes = []
    for i in range(n_planes):
        ssv = ss_ver if i else 0
        bh_px = band_h4 * 4 >> ssv
        o = np.asarray(out[i])[:, PADT:PADT + (band_h4 * 4),
                               PADT:PADT + bw * 4]
        # chroma band rows occupy the top of each (luma-sized) band slab
        full = np.concatenate([o[r][:bh_px] for r in range(n)], axis=0)
        ph, pw = bufs.planes[i].shape
        buf = np.zeros((ph, pw), np.int32)
        cw = min(pw, full.shape[1])
        buf[:min(ph, full.shape[0]), :cw] = full[:ph, :cw]
        planes.append(buf)

    # ---- band-sharded in-loop filters (halo exchange over the mesh) ----
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
        from ..ops.cdef_tpu import (cdef_dir_tpu, adjust_strength_v,
                                    UV_DIRS_TBL)
        cdef_idx_map, noskip = build_cdef_plan(fhdr, coders)
        planes = tf.cdef_banded(mesh, seq, fhdr, bufs, planes,
                                cdef_idx_map, noskip)

    for i in range(n_planes):
        bufs.planes[i][...] = planes[i].astype(bufs.planes[i].dtype)
    return bufs
