"""In-loop filters sharded across chips as row bands with halo exchange.

The reference pipelines post-filters per superblock row across a worker
pool (dav1d src/thread_task.c:810-870, deblock_progress bitmaps). On a
TPU mesh the frame becomes row bands, one per device, and the only
cross-band traffic is a fixed 8-row halo over ICI (`jax.lax.ppermute`):

  * the vertical-edge pass is row-local (whole rows live in the band);
  * the horizontal-edge pass needs up to 7 rows above a band's top edge
    (p-side taps) and writes up to 7 rows back into the neighbour band —
    AV1's filter-width rules confine each edge's read/write span inside
    the adjacent transforms, so every H edge in the frame writes a
    disjoint region (see ops/loopfilter_tpu.deblock_plane_tpu). Each
    band therefore filters [8-row halo | own rows] and returns the halo
    *delta*, which the upstream band adds into its last rows — exact,
    because the write regions are disjoint integers.

CDEF is simpler: 8x8 blocks read a +-2-px neighbourhood of the
post-deblock frame and write only their own pixels, so a 2-row halo in
each direction with no write-back suffices.

Bit-exact with the single-device kernels (tested on the 8-device CPU
mesh the driver uses for multi-chip validation).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.loopfilter_tpu import _apply_pass, _apply_pass_h
from ..ops.cdef_tpu import (cdef_filter_plane_tpu, cdef_dir_tpu,
                            adjust_strength_v, UV_DIRS_TBL, MISSING)

HALO = 8  # rows: covers the widest H-edge p-side reach (7 for wd16 luma)


def _pad_rows(a, rows, fill=0):
    if a.shape[0] == rows:
        return a
    pad = np.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def band_deblock_plane(mesh: Mesh, plane, edge_v, edge_h, lvl_v,
                       lvl_v_prev, lvl_h, lvl_h_prev, e_lut, i_lut,
                       luma: bool, bitdepth: int):
    """Row-band-sharded counterpart of ops/loopfilter_tpu
    .deblock_plane_tpu — same arguments (numpy), plus the mesh. Returns
    the filtered plane (numpy int32)."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    h4, w4 = edge_v.shape
    Hp, Wp = plane.shape

    # 4px rows per band; a band must be at least HALO tall so one
    # neighbour exchange covers the H-edge reach (tiny planes leave
    # trailing bands as pure padding — their edges are inactive)
    band4 = max(-(-h4 // n), HALO // 4)
    tot4 = band4 * n
    ev = _pad_rows(edge_v.astype(np.int32), tot4, -1)
    eh = _pad_rows(edge_h.astype(np.int32), tot4, -1)
    lv = _pad_rows(lvl_v.astype(np.int32), tot4)
    lvp = _pad_rows(lvl_v_prev.astype(np.int32), tot4)
    lh = _pad_rows(lvl_h.astype(np.int32), tot4)
    lhp = _pad_rows(lvl_h_prev.astype(np.int32), tot4)
    pl = _pad_rows(plane.astype(np.int32), max(tot4 * 4, Hp))
    body_rows, tail = pl[:tot4 * 4], pl[tot4 * 4:]

    out = _band_deblock(mesh, axis, n, jnp.asarray(body_rows),
                        jnp.asarray(ev), jnp.asarray(eh), jnp.asarray(lv),
                        jnp.asarray(lvp), jnp.asarray(lh),
                        jnp.asarray(lhp), jnp.asarray(e_lut),
                        jnp.asarray(i_lut), luma, bitdepth, w4)
    out = np.asarray(out)
    return np.concatenate([out, tail], axis=0)[:Hp]


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "n", "luma",
                                    "bitdepth", "w4"))
def _band_deblock(mesh, axis, n, rows, ev, eh, lv, lvp, lh, lhp, e_lut,
                  i_lut, luma, bitdepth, w4):
    specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
             P(axis))

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=specs + (P(), P()),
                       out_specs=P(axis))
    def body(pl_b, ev_b, eh_b, lv_b, lvp_b, lh_b, lhp_b, e_l, i_l):
        idx = jax.lax.axis_index(axis)

        # vertical pass: row-local (x = 0 has no left neighbour)
        ev_b = ev_b.at[:, 0].set(-1)
        vrows = _apply_pass(pl_b, ev_b, lv_b, lvp_b, e_l, i_l, luma,
                            bitdepth, False)

        # halo: previous band's last rows, post-V (band 0 gets zeros and
        # masks its top edge — there is no frame above)
        halo = jax.lax.ppermute(vrows[-HALO:], axis,
                                [(i, i + 1) for i in range(n - 1)])
        eh0 = jnp.where(idx == 0, jnp.full_like(eh_b[0], -1), eh_b[0])
        eh_b = eh_b.at[0].set(eh0)

        ext = jnp.concatenate([halo, vrows], axis=0)
        extT = ext.T
        nvis = w4 * 4
        colsT = _apply_pass_h(extT[:nvis], eh_b.T, lh_b.T, lhp_b.T, e_l,
                              i_l, luma, bitdepth, HALO // 4)
        ext = jnp.concatenate([colsT, extT[nvis:]], axis=0).T

        # return the halo delta to the upstream band; H-edge writes are
        # frame-wide disjoint, so adding deltas is exact
        delta = ext[:HALO] - halo
        back = jax.lax.ppermute(delta, axis,
                                [(i + 1, i) for i in range(n - 1)])
        own = ext[HALO:]
        own = own.at[-HALO:].add(back)
        return own

    return body(rows, ev, eh, lv, lvp, lh, lhp, e_lut, i_lut)


def band_cdef_plane(mesh: Mesh, plane, dir_map, pri_map, sec_map, damping,
                    active, bitdepth: int, bw: int, bh: int):
    """Row-band-sharded cdef_filter_plane_tpu. Shards the per-pixel
    filter over the mesh with a 2-row pre-CDEF halo exchange; the
    per-8x8 maps (direction, strengths) are tiny and passed sharded by
    block row. Bands are block-row aligned; frame top/bottom keep the
    MISSING border."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    hb, wb = dir_map.shape
    Hp, Wp = plane.shape

    bandb = -(-hb // n)                     # block rows per band
    totb = bandb * n
    dirs = _pad_rows(np.asarray(dir_map, np.int32), totb)
    pris = _pad_rows(np.asarray(pri_map, np.int32), totb)
    secs = _pad_rows(np.asarray(sec_map, np.int32), totb)
    acts = _pad_rows(np.asarray(active, bool), totb)
    # bands cover exactly the filter region (hb*bh rows); rows below —
    # frame-buffer alignment padding — are MISSING for tap purposes in
    # the single-device kernel, so pad with MISSING, not real pixels
    pl = np.asarray(plane, np.int32)
    body_rows = _pad_rows(pl[:hb * bh], totb * bh, fill=MISSING)
    tail = pl[hb * bh:]

    out = _band_cdef(mesh, axis, n, jnp.asarray(body_rows),
                     jnp.asarray(dirs), jnp.asarray(pris),
                     jnp.asarray(secs), jnp.asarray(acts), damping,
                     bitdepth, bw, bh)
    return np.concatenate([np.asarray(out), tail], axis=0)[:Hp]


def shard_lr_batch(mesh: Mesh, padded, fh, fv, w: int, h: int,
                   bitdepth: int):
    """Loop-restoration stripes sharded over the mesh. Each stripe unit
    is independent given its padded input (the 3-px borders carry the
    pre-filter rows the reference saves in copy_lpf), so the batch axis
    shards with no halo at all — the reference's per-sbrow LR task chain
    (lr_apply_tmpl.c) becomes pure data parallelism."""
    from ..ops.looprestoration_tpu import wiener_batch_tpu

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    B = padded.shape[0]
    padn = (-B) % n
    pad_in = np.concatenate([padded,
                             np.repeat(padded[-1:], padn, 0)]) \
        if padn else padded
    fh_in = np.concatenate([fh, np.repeat(fh[-1:], padn, 0)]) \
        if padn else fh
    fv_in = np.concatenate([fv, np.repeat(fv[-1:], padn, 0)]) \
        if padn else fv

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=P(axis))
    def body(p, a, b):
        return wiener_batch_tpu(p, a, b, w, h, bitdepth)

    out = body(jnp.asarray(pad_in), jnp.asarray(fh_in),
               jnp.asarray(fv_in))
    return np.asarray(out)[:B]


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "n", "damping",
                                    "bitdepth", "bw", "bh"))
def _band_cdef(mesh, axis, n, rows, dirs, pris, secs, acts, damping,
               bitdepth, bw, bh):

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    def body(pl_b, dir_b, pri_b, sec_b, act_b):
        idx = jax.lax.axis_index(axis)
        # 2-row pre-CDEF halos; frame top/bottom stay MISSING
        top = jax.lax.ppermute(pl_b[-2:], axis,
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(pl_b[:2], axis,
                               [(i + 1, i) for i in range(n - 1)])
        top = jnp.where(idx == 0, MISSING, top)
        bot = jnp.where(idx == n - 1, MISSING, bot)
        return cdef_filter_plane_tpu(pl_b, pl_b, dir_b, pri_b, sec_b,
                                     damping, act_b, bitdepth, bw, bh,
                                     halo=(top, bot))

    return body(rows, dirs, pris, secs, acts)
