"""Device (TPU/XLA) inter-frame reconstruction.

The dav1d 2-pass seam re-expressed TPU-first: the host entropy pass has
already produced per-block modes/MVs and dequantized coefficients; this
module turns them into dense unit descriptor arrays and runs the pixel work
as batched device kernels:

  * translational MC (single-ref and compound avg/weighted-avg) as
    fixed-size unit batches over stacked reference planes (ops/mc_tpu),
  * residual inverse transforms bucketed by (tx, txtp) with scatter-add
    (ops/itx).

Blocks the batched path does not cover (warp, OBMC, inter-intra, masked
compound, sub-8x8 chroma, scaled refs) and intra blocks (sequential
neighbour dependency) run on the host afterwards, in decode order — valid
because inter prediction never reads current-frame pixels, so all batched
work commutes with the sequential remainder.

Bit-exact with the NumPy reference pipeline (and therefore with dav1d).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..host.tilecoder import (T_BLOCK_DIM, T_TXFM, COMP_INTER_NONE,
                              COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG)
from ..ops.mc_tpu import (mc_unit_batch, mc_hv_batch, w_avg_batch,
                          scatter_units, scatter_add_units)
from ..ops.itx import itx_residual
from .ref_decoder import _recon_tile, _gmv_warp_params


def _block_device_class(fhdr, coder, b, refs, cur_w, cur_h):
    """'single' / 'comp' if the batched path covers this block, else None
    (host fallback)."""
    if b.intra:
        return None
    if fhdr.frame_type in (0, 2):  # intrabc
        return None
    if b.motion_mode != 0 or b.interintra_type:
        return None
    if b.filter2d > 8:
        return None
    for i in range(2 if b.comp_type else 1):
        rb = refs[fhdr.refidx[b.ref[i]]]
        if rb is None or rb.width != cur_w or rb.height != cur_h:
            return None
    if b.comp_type == COMP_INTER_NONE:
        if b.inter_mode == 2:  # GLOBALMV: translational only on device
            if _gmv_warp_params(fhdr, b.ref[0], False) is not None:
                return None
        b_dim = T_BLOCK_DIM[b.bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        # sub8x8 chroma needs neighbour MVs -> host
        ss_hor = 1 if coder.layout != 3 else 0
        ss_ver = 1 if coder.layout == 1 else 0
        if not coder.monochrome and (bw4 == ss_hor or bh4 == ss_ver):
            return None
        return "single"
    if b.comp_type in (COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG):
        if b.inter_mode == 6:  # GLOBALMV_GLOBALMV warp
            for i in range(2):
                if _gmv_warp_params(fhdr, b.ref[i], False) is not None:
                    return None
        return "comp"
    return None


def _units_for_block(plan, pl, ss_hor, ss_ver, b, mv, ref_i, f2d,
                     key_extra=()):
    """Decompose one plane-block into fixed-size units and append
    descriptors into plan[(uw, uh, has_h, has_v) + key_extra]."""
    b_dim = T_BLOCK_DIM[b.bs]
    bw4, bh4 = int(b_dim[0]), int(b_dim[1])
    if pl:
        bw4 = bw4 << (bw4 == ss_hor)
        bh4 = bh4 << (bh4 == ss_ver)
        bx = b.bx & ~ss_hor
        by = b.by & ~ss_ver
    else:
        ss_hor = ss_ver = 0
        bx, by = b.bx, b.by
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    pw, ph = bw4 * h_mul, bh4 * v_mul
    mvy, mvx = mv
    mx = (mvx & (15 >> (0 if ss_hor else 1))) << (0 if ss_hor else 1)
    my = (mvy & (15 >> (0 if ss_ver else 1))) << (0 if ss_ver else 1)
    dx = bx * h_mul + (mvx >> (3 + ss_hor))
    dy = by * v_mul + (mvy >> (3 + ss_ver))
    dst_x, dst_y = bx * h_mul, by * v_mul
    has_h, has_v = mx != 0, my != 0
    uw, uh = min(pw, 8), min(ph, 8)
    key = (uw, uh, has_h, has_v) + key_extra
    lst = plan.setdefault(key, [])
    for oy in range(0, ph, uh):
        for ox in range(0, pw, uw):
            lst.append((ref_i,
                        dy + oy - (3 if has_v else 0),
                        dx + ox - (3 if has_h else 0),
                        mx, my, f2d, dst_y + oy, dst_x + ox))


def recon_frame_tpu(seq, fhdr, coders, bufs, refs, jnt_weights=None):
    """Device-batched inter reconstruction; mutates bufs.planes."""
    bd = seq.bitdepth
    cur_w, cur_h = fhdr.width[0], fhdr.height
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    n_planes = len(bufs.planes)

    intra_frame = fhdr.frame_type in (0, 2)

    # --- pass 1 (host): classify blocks, build unit plans ---
    plans = [dict() for _ in range(n_planes)]        # single-ref put units
    # compound: per plane, per (uw, uh): parallel unit descriptor lists for
    # i=0/1 plus join weight and destinations (AVG == w_avg with weight 8)
    cunits = [dict() for _ in range(n_planes)]
    device_blocks = set()
    for ci, coder in enumerate(coders):
        if intra_frame:
            break
        for bi, b in enumerate(coder.blocks):
            cls = _block_device_class(fhdr, coder, b, refs, cur_w, cur_h)
            if cls is None:
                continue
            device_blocks.add((ci, bi))
            b_dim = T_BLOCK_DIM[b.bs]
            bw4, bh4 = int(b_dim[0]), int(b_dim[1])
            has_chroma = (n_planes > 1 and
                          (bw4 > ss_hor or b.bx & 1) and
                          (bh4 > ss_ver or b.by & 1))
            planes_it = range(n_planes) if has_chroma else (0,)
            if cls == "single":
                for pl in planes_it:
                    _units_for_block(plans[pl], pl, ss_hor, ss_ver, b,
                                     b.mv[0], b.ref[0], b.filter2d)
            else:
                jw = jnt_weights[b.ref[0]][b.ref[1]] \
                    if b.comp_type == COMP_INTER_WEIGHTED_AVG else 8
                for pl in planes_it:
                    tmp0, tmp1 = {}, {}
                    _units_for_block(tmp0, pl, ss_hor, ss_ver, b, b.mv[0],
                                     b.ref[0], b.filter2d)
                    _units_for_block(tmp1, pl, ss_hor, ss_ver, b, b.mv[1],
                                     b.ref[1], b.filter2d)
                    (k0, l0), = tmp0.items()
                    (k1, l1), = tmp1.items()
                    assert k0[:2] == k1[:2] and len(l0) == len(l1)
                    group = cunits[pl].setdefault(k0[:2], [])
                    for u0, u1 in zip(l0, l1):
                        # u = (ref, oy, ox, mx, my, f2d, dst_y, dst_x)
                        group.append((u0[:6] + k0[2:4],
                                      u1[:6] + k1[2:4],
                                      jw, u0[6], u0[7]))

    # --- device: stacked reference planes per plane index ---
    dev_planes = [jnp.asarray(p.astype(np.int32)) for p in bufs.planes] \
        if not intra_frame else None
    ref_stacks = []
    for pl in range(n_planes if not intra_frame else 0):
        stack = []
        for i in range(7):
            rb = refs[fhdr.refidx[i]]
            if rb is None or rb.width != cur_w or rb.height != cur_h:
                stack.append(np.zeros_like(bufs.planes[0] if pl == 0
                                           else bufs.planes[pl],
                                           dtype=np.int32))
            else:
                stack.append(rb.planes[pl].astype(np.int32))
        # clamp gather bounds to the visible plane area (dav1d mc:980)
        ssh = ss_hor if pl else 0
        ssv = ss_ver if pl else 0
        w_vis = (cur_w + ssh) >> ssh
        h_vis = (cur_h + ssv) >> ssv
        ref_stacks.append(jnp.asarray(
            np.stack([s[:h_vis, :w_vis] for s in stack])))

    # --- single-ref MC batches ---
    hcaches = [dict() for _ in range(n_planes)]  # shared H-plane stacks
    for pl in range(n_planes):
        for key, lst in sorted(plans[pl].items()):
            uw, uh, has_h, has_v = key
            arr = np.asarray(lst, np.int32)
            if has_h and has_v:
                # two-stage path (full-plane H filter + Pallas V pass)
                out = mc_hv_batch(ref_stacks[pl], arr[:, :6], uw, uh, bd,
                                  False, hcaches[pl])
            else:
                out = mc_unit_batch(
                    (ref_stacks[pl], jnp.asarray(arr[:, 0]),
                     jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]),
                     jnp.asarray(arr[:, 3]), jnp.asarray(arr[:, 4]),
                     jnp.asarray(arr[:, 5])),
                    uw, uh, has_h, has_v, bd, False)
            dev_planes[pl] = scatter_units(
                dev_planes[pl], out, jnp.asarray(arr[:, 6]),
                jnp.asarray(arr[:, 7]), uh, uw)

    # --- compound MC batches: per-side prep into aligned slot buffers,
    # then a single weighted join (AVG == weight 8, bit-exact) ---
    for pl in range(n_planes):
        for (uw, uh), group in sorted(cunits[pl].items()):
            N = len(group)
            tmps = []
            for i in (0, 1):
                tmp = jnp.zeros((N, uh, uw), jnp.int32)
                # sub-bucket by subpel case, keep slot alignment
                cases = {}
                for slot, entry in enumerate(group):
                    u = entry[i]
                    cases.setdefault((u[6], u[7]), []).append((slot, u))
                for (hh, hv), lst in sorted(cases.items()):
                    arr = np.asarray([u[:6] for _, u in lst], np.int32)
                    slots = jnp.asarray(
                        np.asarray([s for s, _ in lst], np.int32))
                    if hh and hv:
                        out = mc_hv_batch(ref_stacks[pl], arr, uw, uh,
                                          bd, True, hcaches[pl])
                    else:
                        out = mc_unit_batch(
                            (ref_stacks[pl], jnp.asarray(arr[:, 0]),
                             jnp.asarray(arr[:, 1]),
                             jnp.asarray(arr[:, 2]),
                             jnp.asarray(arr[:, 3]),
                             jnp.asarray(arr[:, 4]),
                             jnp.asarray(arr[:, 5])),
                            uw, uh, bool(hh), bool(hv), bd, True)
                    tmp = tmp.at[slots].set(out)
                tmps.append(tmp)
            jw = jnp.asarray(np.asarray([e[2] for e in group], np.int32)
                             )[:, None, None]
            out = w_avg_batch(tmps[0], tmps[1], jw, bd)
            ys = jnp.asarray(np.asarray([e[3] for e in group], np.int32))
            xs = jnp.asarray(np.asarray([e[4] for e in group], np.int32))
            dev_planes[pl] = scatter_units(dev_planes[pl], out, ys, xs,
                                           uh, uw)

    # --- residual inverse transforms, ALL blocks ---
    # Device-covered inter blocks scatter-add straight onto the plane
    # (their prediction is already there). Every other block — intra,
    # intrabc, host-fallback inter — gets its residual batch-computed on
    # device too and handed to the host walk via a (plane, y, x) map:
    # prediction needs reconstructed neighbours (sequential), but the
    # inverse transforms (the FLOPs) depend only on coefficients.
    rplans = {}     # scatter-add buckets
    hplans = {}     # host-map buckets
    for ci, coder in enumerate(coders):
        for bi, b in enumerate(coder.blocks):
            if b.skip:
                continue
            dst = rplans if (ci, bi) in device_blocks else hplans
            for cb in coder.coefs[b.coef_lo:b.coef_hi]:
                if cb.eob < 0:
                    continue
                dst.setdefault((cb.plane, cb.tx, cb.txtp), []).append(
                    (cb.cf, cb.y * 4, cb.x * 4))
    for (pl, tx, txtp), lst in sorted(rplans.items()):
        cfs = jnp.asarray(np.stack([e[0] for e in lst]).astype(np.int32))
        res = itx_residual(cfs, tx, txtp, bd)
        ys = jnp.asarray(np.asarray([e[1] for e in lst], np.int32))
        xs = jnp.asarray(np.asarray([e[2] for e in lst], np.int32))
        h_px, w_px = res.shape[1], res.shape[2]
        dev_planes[pl] = scatter_add_units(dev_planes[pl], res, ys, xs,
                                           h_px, w_px, bd)
    residual_map = {}
    for (pl, tx, txtp), lst in sorted(hplans.items()):
        cfs = jnp.asarray(np.stack([e[0] for e in lst]).astype(np.int32))
        res = np.asarray(itx_residual(cfs, tx, txtp, bd))
        for i, (_, y_px, x_px) in enumerate(lst):
            residual_map[(pl, y_px // 4, x_px // 4)] = res[i]

    # download
    if not intra_frame:
        for pl in range(n_planes):
            bufs.planes[pl][...] = np.asarray(dev_planes[pl]).astype(
                bufs.planes[pl].dtype)

    # --- pass 2 (host): intra + uncovered inter blocks in decode order ---
    for ci, coder in enumerate(coders):
        skip_set = {bi for bi in range(len(coder.blocks))
                    if (ci, bi) in device_blocks}
        _recon_tile(seq, fhdr, coder, bufs, refs, jnt_weights,
                    device_done=skip_set, residuals=residual_map)
    return bufs
