"""Pallas TPU kernel for the MC vertical pass (the per-unit mid-window
fetch + 8-tap filter).

XLA lowers per-unit window gathers to element-at-a-time loops (~60-80 ms
for a dense 1080p luma frame); this kernel instead DMAs one tile-aligned
(24, 256) int16 block per unit from the H-filtered plane stack in HBM
(deep-pipelined, 8 copies in flight), normalizes the window to the block
origin with dynamic lane/sublane rotates, and runs the vertical 8-tap
filter as chunk-vectorized VPU multiply-adds — ~13x faster, bit-exact
with ops/mc_tpu.mc_unit_batch_hv (the XLA reference path, which remains
the fallback on non-TPU backends).

Alignment rules honored (Mosaic): DMA slice sizes and starts must be
multiples of the (8, 128) tile; dynamic VMEM stores need static lane
offsets, hence the statically unrolled unit loop.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 64      # units per grid step (static unroll)
DEPTH = 8       # DMA copies in flight
RB, LB = 24, 256  # per-unit aligned DMA block (rows, lanes)
PAD_T = 16      # replicated rows above the mid planes (= y clamping)


@functools.lru_cache(maxsize=None)
def _make_vpass(uw: int, uh: int, bitdepth: int, prep: bool):
    ib = 4 if bitdepth == 8 else 14 - bitdepth
    bias = 0 if bitdepth == 8 else 8192
    bd_max = (1 << bitdepth) - 1
    win_h = uh + 7
    LW = CHUNK * uw

    def kernel(slot_ref, ry_ref, r0_ref, rx_ref, x0_ref, hstack_ref,
               fv_ref, out_ref, dmabuf, scratch, sems):
        i = pl.program_id(0)
        base = i * CHUNK

        def dma(u):
            return pltpu.make_async_copy(
                hstack_ref.at[slot_ref[base + u],
                              pl.ds(pl.multiple_of(ry_ref[base + u], 8),
                                    RB),
                              pl.ds(pl.multiple_of(rx_ref[base + u], 128),
                                    LB)],
                dmabuf.at[u % DEPTH],
                sems.at[u % DEPTH])

        for u in range(DEPTH):
            dma(u).start()

        # wait -> normalize+store -> start the slot's next copy (one
        # outstanding copy per semaphore slot)
        for u in range(CHUNK):
            dma(u).wait()
            # rotate requires 32-bit data; the block is tiny
            blk = dmabuf[u % DEPTH].astype(jnp.int32)
            r0 = r0_ref[base + u]
            x0 = x0_ref[base + u]
            blk = pltpu.roll(blk, (RB - r0) % RB, 0)
            blk = pltpu.roll(blk, (LB - x0) % LB, 1)
            scratch[:, u * uw:(u + 1) * uw] = \
                blk[0:win_h + 1, 0:uw].astype(jnp.int16)
            if u + DEPTH < CHUNK:
                dma(u + DEPTH).start()

        mid = scratch[:].astype(jnp.int32)
        acc = mid[0:uh, :] * fv_ref[0][None, :]
        for k in range(1, 8):
            acc = acc + mid[k:k + uh, :] * fv_ref[k][None, :]
        if prep:
            out_ref[:] = ((acc + 32) >> 6) - bias
        else:
            out_ref[:] = jnp.clip(
                (acc + ((1 << (6 + ib)) >> 1)) >> (6 + ib), 0, bd_max)

    @jax.jit
    def run(hstack, slot, ry, r0, rx, x0, fv_lanes):
        B = slot.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B // CHUNK,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((8, LW), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((uh, LW), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((DEPTH, RB, LB), jnp.int16),
                pltpu.VMEM((win_h + 1, LW), jnp.int16),
                pltpu.SemaphoreType.DMA((DEPTH,)),
            ])
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((uh, B * uw), jnp.int32),
            grid_spec=grid_spec,
        )(slot, ry, r0, rx, x0, hstack, fv_lanes)

    return run


def pad_hstack(hstack):
    """Pad mid planes for aligned block DMA: PAD_T replicated rows on
    top (y clamping), rows below to cover ry+RB, lanes zero-padded to a
    128 multiple + LB. Returns (hstack_padded, W22)."""
    C, Hh, W22 = hstack.shape
    hp = -(-(Hh + PAD_T + RB) // 8) * 8
    wp = ((W22 + 127) // 128) * 128 + LB
    hpad = jnp.concatenate([
        jnp.repeat(hstack[:, :1], PAD_T, axis=1), hstack,
        jnp.repeat(hstack[:, -1:], hp - Hh - PAD_T, axis=1)], axis=1)
    return jnp.pad(hpad, ((0, 0), (0, 0), (0, wp - W22))), W22


def vpass_prep(slot, arr, tv, uw, uh, Hh, W):
    """Host-side prep for the vertical-pass kernel (pure numpy; shared
    by the eager wrapper below and the fused frame program, which uploads
    these as part of its single descriptor transfer). Returns
    (slot, ry, r0, rx, x0, fv_lanes) int32 arrays padded to a CHUNK
    multiple, plus the padded batch Bp."""
    B = arr.shape[0]
    padn = (-B) % CHUNK
    if padn:
        arr = np.concatenate([arr, np.repeat(arr[-1:], padn, 0)])
        tv = np.concatenate([tv, np.repeat(tv[-1:], padn)])
        slot = np.concatenate([slot, np.repeat(slot[-1:], padn)])
    oy_p = np.clip(arr[:, 1], -PAD_T, Hh - 1) + PAD_T
    oxh = np.clip(arr[:, 2], -15, W - 1) + 15
    rows = np.where(uh <= 4, 3 + (tv & 1), tv)
    fv = _SUBPEL_NP[rows, arr[:, 4] - 1].astype(np.int32)  # (B', 8)
    fv_lanes = np.repeat(fv[:, :, None], uw, axis=2)
    fv_lanes = fv_lanes.transpose(1, 0, 2).reshape(8, -1)
    return ((slot.astype(np.int32), (oy_p & ~7).astype(np.int32),
             (oy_p & 7).astype(np.int32), (oxh & ~127).astype(np.int32),
             (oxh & 127).astype(np.int32), fv_lanes.astype(np.int32)),
            B + padn)


def vpass_prep_compact(slot, arr, tv, uw, uh, Hh, W):
    """Compact variant of vpass_prep for the fused frame program: emits
    per-UNIT scalars only — (slot, ry, r0, rx, x0, frow, my), all
    int16-safe — and lets the traced interpreter expand the (8, B*uw)
    fv_lanes tap array on DEVICE (vpass_cols_device). The expanded
    lanes were ~70% of the 1080p frame descriptor upload."""
    B = arr.shape[0]
    padn = (-B) % CHUNK
    if padn:
        arr = np.concatenate([arr, np.repeat(arr[-1:], padn, 0)])
        tv = np.concatenate([tv, np.repeat(tv[-1:], padn)])
        slot = np.concatenate([slot, np.repeat(slot[-1:], padn)])
    oy_p = np.clip(arr[:, 1], -PAD_T, Hh - 1) + PAD_T
    oxh = np.clip(arr[:, 2], -15, W - 1) + 15
    rows = np.where(uh <= 4, 3 + (tv & 1), tv)
    return ((slot.astype(np.int32), (oy_p & ~7).astype(np.int32),
             (oy_p & 7).astype(np.int32), (oxh & ~127).astype(np.int32),
             (oxh & 127).astype(np.int32), rows.astype(np.int32),
             arr[:, 4].astype(np.int32)),
            B + padn)


def vpass_cols_device(frow, my, uw):
    """Expand (frow, my) per-unit tap selectors to the (8, Bp*uw)
    fv_lanes array the vpass kernel wants — traced (device) twin of the
    host expansion in vpass_prep."""
    fv = jnp.asarray(_SUBPEL_NP, jnp.int32)[frow, my - 1]   # (Bp, 8)
    fv = jnp.repeat(fv[:, :, None], uw, axis=2)             # (Bp, 8, uw)
    return jnp.transpose(fv, (1, 0, 2)).reshape(8, -1)


def vpass_run(hstack_padded, slot, ry, r0, rx, x0, fv_lanes, uw, uh,
              bitdepth, prep, n_units):
    """Traced vertical pass over prepped descriptor arrays (jnp or np);
    returns (n_units, uh, uw) int32."""
    run = _make_vpass(uw, uh, bitdepth, prep)
    out = run(hstack_padded, jnp.asarray(slot), jnp.asarray(ry),
              jnp.asarray(r0), jnp.asarray(rx), jnp.asarray(x0),
              jnp.asarray(fv_lanes))
    Bp = slot.shape[0]
    return jnp.transpose(out.reshape(uh, Bp, uw), (1, 0, 2))[:n_units]


def mc_vpass_pallas(hstack_padded, Hh, W, slot, arr, tv, subpel_table,
                    uw, uh, bitdepth, prep):
    """Host prep + kernel run for one has_h&has_v bucket.

    hstack_padded: from pad_hstack; Hh: unpadded mid-plane rows; W:
    visible ref width; slot: (B,) combo ids; arr: (B, 6) np int32
    descriptors (ref, oy, ox, mx, my, f2d); tv: (B,) vertical filter
    type. Returns (B, uh, uw) int32 device array."""
    B = arr.shape[0]
    cols, _ = vpass_prep(slot, arr, tv, uw, uh, Hh, W)
    return vpass_run(hstack_padded, *cols, uw, uh, bitdepth, prep, B)


HROWS = 128     # max row band per hplane grid step (shrinks at 4K)
HGROUP = 4      # combos per grid step (same ref; cuts per-step overhead)


def _hplane_rows(w_out: int) -> int:
    """Row band per hplane grid step, sized against the 16 MB scoped
    VMEM limit. Measured footprint is ~45 B per (row, lane): the int16
    in/out blocks double-buffered PLUS the kernel's int32 widening and
    accumulator temporaries. Target ~11.5 MB: 128 rows at <=1080p
    widths (unchanged), 64 at 4K (fixed 128 OOM'd Mosaic's compile
    with 22.5 MB)."""
    rows = (11_500_000 // 45) // w_out
    return max(8, min(HROWS, rows & ~7))


@functools.lru_cache(maxsize=None)
def _make_hplanes(bitdepth: int, n_rb: int, w_in: int, w_out: int,
                  hrows: int = HROWS):
    ib = 4 if bitdepth == 8 else 14 - bitdepth
    rnd = (1 << (6 - ib)) >> 1
    sh = 6 - ib

    def kernel(refmap_ref, taps_ref, refs_ref, out_ref):
        # refs block: (1, hrows, w_in) int16 selected by refmap[c];
        # taps: full (C, 8) int32 table; out: (1, hrows, w_out) int16
        g = pl.program_id(1)
        x = refs_ref[0].astype(jnp.int32)
        for j in range(HGROUP):
            c = g * HGROUP + j
            acc = x[:, 0:w_out] * taps_ref[c, 0]
            for k in range(1, 8):
                acc = acc + x[:, k:k + w_out] * taps_ref[c, k]
            out_ref[j] = ((acc + rnd) >> sh).astype(jnp.int16)

    @jax.jit
    def run(refs_padded, refmap, taps):
        C = refmap.shape[0]
        # grid (row-band, combo): combos are sorted by ref, so the ref
        # input block index is unchanged across consecutive combo steps
        # and the pipeline skips the re-fetch — input reads drop from
        # C x plane to R x plane
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rb, C // HGROUP),
            in_specs=[
                pl.BlockSpec(taps.shape, lambda rb, g, refmap: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hrows, w_in),
                             lambda rb, g, refmap:
                             (refmap[g * HGROUP], rb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HGROUP, hrows, w_out),
                                   lambda rb, g, refmap: (g, rb, 0),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n_rb * hrows, w_out),
                                           jnp.int16),
            grid_spec=grid_spec,
        )(refmap, taps, refs_padded)

    return run


def hplanes_prep(combos):
    """Host-side prep: pad combos per-ref to HGROUP multiples (same-ref
    grouping lets the kernel skip ref re-fetches). Returns
    (refmap (C',) int32, taps (C', 8) int32, remap (C,) int32)."""
    C0 = combos.shape[0]
    groups = []
    remap = np.zeros(C0, np.int32)
    for r in np.unique(combos[:, 0]):
        idx = np.nonzero(combos[:, 0] == r)[0]
        start = sum(len(g) for g in groups)
        remap[idx] = start + np.arange(len(idx))
        rows = combos[idx]
        padn = (-len(idx)) % HGROUP
        if padn:
            rows = np.concatenate([rows, np.repeat(rows[-1:], padn, 0)])
        groups.append(rows)
    combos = np.concatenate(groups).astype(np.int32)
    taps = np.asarray(_SUBPEL_NP[combos[:, 1], combos[:, 2] - 1],
                      np.int32)
    return combos[:, 0].astype(np.int32), taps, remap


def hplanes_run(ref_stack, refmap, taps, bitdepth):
    """Traced H-pass: refmap/taps from hplanes_prep (jnp or np).
    Returns hstack (C', H, W+22) int16."""
    R, H, W = (int(s) for s in ref_stack.shape)
    w_out = W + 22
    w_in_raw = w_out + 7
    w_in = -(-w_in_raw // 128) * 128
    hrows = _hplane_rows(w_out)
    n_rb = -(-H // hrows)
    # x window: x0 in [-15, W+6], taps reach x0+7 -> pad 15 left,
    # replicate right to w_in
    refs16 = ref_stack.astype(jnp.int16)
    left = jnp.repeat(refs16[:, :, :1], 15, axis=2)
    right = jnp.repeat(refs16[:, :, -1:], w_in - W - 15, axis=2)
    refs_p = jnp.concatenate([left, refs16, right], axis=2)
    if n_rb * hrows != H:
        refs_p = jnp.concatenate(
            [refs_p, jnp.repeat(refs_p[:, -1:], n_rb * hrows - H,
                                axis=1)], axis=1)
    run = _make_hplanes(bitdepth, n_rb, w_in, w_out, hrows)
    out = run(refs_p, jnp.asarray(refmap), jnp.asarray(taps))
    return out[:, :H]


def mc_hplanes_pallas(ref_stack, combos, bitdepth):
    """Pallas counterpart of ops/mc_tpu.mc_hplanes: one grid step per
    (HGROUP same-ref combos, 128-row band) — bit-exact with the XLA
    path. Combos are padded per-ref to HGROUP multiples; returns
    (hstack (C', H, w22) int16, remap (C,) np int32) where remap
    translates original combo ids to rows of the padded stack.
    ref_stack: (R, H, W) int32 (pixels); combos: (C, 3) np int32."""
    refmap, taps, remap = hplanes_prep(combos)
    return hplanes_run(ref_stack, refmap, taps, bitdepth), remap


from ..data.tables import TABLES as _TABLES
_SUBPEL_NP = np.asarray(_TABLES["mc_subpel_filters"], np.int32)


def pallas_available() -> bool:
    """Mosaic kernels need a real TPU backend (incl. the axon tunnel).
    DAV1D_TPU_NO_PALLAS=1 forces the XLA fallback kernels (used to
    isolate Mosaic compile cost in the fused frame program)."""
    import os
    if os.environ.get("DAV1D_TPU_NO_PALLAS"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
