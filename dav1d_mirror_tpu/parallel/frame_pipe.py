"""Frame/GOP pipeline parallelism: the mesh axis for multi-frame decode.

The reference overlaps frames with frame contexts (n_fc = min(8,
ceil(sqrt(n_tc))), dav1d src/lib.c:111-123) and blocks each frame's
sbrows on reference-row progress atomics (src/thread_task.c:403-431).
On a TPU mesh the same dependency structure becomes a STATIC schedule:

  1. `plan_gop_levels` — group frames into dependency levels from the
     reference-slot graph (a frame depends on the in-batch frames that
     last wrote the slots it references). Frames in one level are
     mutually independent.
  2. `fanout_gop_mc` — run one level's motion compensation sharded over
     the mesh 'frame' axis. Reference planes are passed replicated
     (in_specs P()): under GSPMD that is the ref-plane broadcast over
     ICI that replaces the reference's shared-memory progress waits.

Bit-exact with the single-device unit batches (tested on the 8-device
CPU mesh).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.mc_tpu import mc_unit_batch


def plan_gop_levels(frame_hdrs):
    """frame_hdrs: decode-order list of FrameHeaders in one batch.
    Returns a list of levels, each a list of indices into frame_hdrs;
    frames in one level reference only slots written by earlier levels
    (or refs outside the batch), so their pixel reconstruction can run
    concurrently. This is the static form of dav1d's per-row progress
    gating (thread_task.c check_tile:403-431)."""
    slot_writer = [-1] * 8          # frame index that last wrote slot i
    level_of = [0] * len(frame_hdrs)
    levels = []
    for i, f in enumerate(frame_hdrs):
        lvl = 0
        if f.frame_type in (1, 3):  # INTER / SWITCH
            for r in set(f.refidx):
                w = slot_writer[r]
                if w >= 0:
                    lvl = max(lvl, level_of[w] + 1)
        level_of[i] = lvl
        while len(levels) <= lvl:
            levels.append([])
        levels[lvl].append(i)
        for s in range(8):
            if (f.refresh_frame_flags >> s) & 1:
                slot_writer[s] = i
    return levels


def fanout_gop_mc(mesh: Mesh, ref_stack, units, uw: int, uh: int,
                  has_h: bool, has_v: bool, bitdepth: int):
    """One dependency level's MC across the 'frame' mesh axis.

    ref_stack: (R, H, W) int32 reference planes, shared by every frame
    in the level (replicated -> ICI broadcast under GSPMD).
    units: (F, N, 6) int32 per-frame unit descriptors
    (ref, oy, ox, mx, my, f2d), F divisible by the mesh size (pad frames
    with N=0-equivalent descriptors if needed).
    Returns (F, N, uh, uw) predicted units."""
    axis = mesh.axis_names[0]

    @functools.partial(jax.jit, static_argnames=())
    def run(refs, us):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(), P(axis)),
                           out_specs=P(axis))
        def body(refs_l, us_l):
            def one_frame(u):
                return mc_unit_batch(
                    (refs_l, u[:, 0], u[:, 1], u[:, 2], u[:, 3],
                     u[:, 4], u[:, 5]),
                    uw, uh, has_h, has_v, bitdepth, False)
            return jax.vmap(one_frame)(us_l)
        return body(refs, us)

    return run(jnp.asarray(ref_stack), jnp.asarray(units))
