"""Cross-frame ROW-GRANULAR overlap: the ring-attention-style schedule
(SURVEY §5.7) that replaces dav1d's per-row progress atomics.

dav1d lets frame N+1 start reconstructing superblock row r as soon as
frame N has finished filtering rows <= r + max_mv_rows
(src/thread_task.c:403-431 check_tile / lowest-pixel gating, updated
row-by-row at runtime).  On a TPU there are no runtime atomics — the
same overlap is derived STATICALLY: motion vectors are bounded (either
by the spec's MV range or by a per-frame scan of the decoded MVs), so
the dependency "band (f, r) needs band (f', r + pad)" is known before
any pixel work runs.  ``plan_row_waves`` turns a GOP's frame dependency
graph + per-frame row-band counts into wavefronts of (frame, band)
pairs; every wave's members are mutually independent, so they run as
one batched device dispatch (or shard over a mesh axis).

The payoff over whole-frame leveling (``plan_gop_levels``): a chain of
F dependent frames with B bands each pipelines in F + (B-1)·step waves
instead of F·B — the classic software-pipelining diagonal.
"""
from __future__ import annotations

import functools


def mv_row_pad(max_mv_y_8px: int, band_rows: int) -> int:
    """How many of the REFERENCE frame's bands a band can reach.

    max_mv_y_8px: largest |MV.y| in 1/8-pel units (spec bound 1<<13, or
    a per-frame measured bound); band_rows: pixel rows per band.
    +8 covers the 8-tap filter reach below the MV target row."""
    reach = (max_mv_y_8px >> 3) + 8
    return -(-reach // band_rows)


def plan_row_waves(deps: list[list[int]], n_bands: int, pad: int):
    """Static row-granular overlap schedule.

    deps: deps[f] = list of frame indices f' that frame f references
    (from ``plan_gop_levels``-style header analysis); intra/keyframes
    have deps[f] == [].  n_bands: row bands per frame.  pad: how many
    extra bands of every reference must be complete before a band can
    run (``mv_row_pad``).

    Returns a list of waves; each wave is a list of (frame, band)
    pairs, all mutually independent given previous waves are done.
    Property: band (f, r) is scheduled strictly after band (f', r')
    for every dependency f' and every r' <= min(r + pad, n_bands-1).
    """
    wave_of = {}
    for f in range(len(deps)):
        for r in range(n_bands):
            w = 0
            if deps[f]:
                for fp in deps[f]:
                    gate = min(r + pad, n_bands - 1)
                    w = max(w, wave_of[(fp, gate)] + 1)
            if r > 0:
                # in-frame raster order (intra/filters are sequential
                # down the frame; fully inter-parallel callers may drop
                # this by passing the bands of one frame as one unit)
                w = max(w, wave_of[(f, r - 1)] + 1)
            wave_of[(f, r)] = w
    waves = []
    for (f, r), w in wave_of.items():
        while len(waves) <= w:
            waves.append([])
        waves[w].append((f, r))
    return waves


def check_waves(waves, deps, n_bands: int, pad: int) -> None:
    """Assert the schedule's dependency property (used by tests and as
    a guard when deriving pads from measured MV bounds)."""
    done_at = {}
    for w, members in enumerate(waves):
        for f, r in members:
            done_at[(f, r)] = w
    for f, fdeps in enumerate(deps):
        for r in range(n_bands):
            for fp in fdeps:
                gate = min(r + pad, n_bands - 1)
                assert done_at[(fp, gate)] < done_at[(f, r)], \
                    (f, r, fp, gate)


def pipeline_depth(waves) -> int:
    return len(waves)


# ------------------------------------------------------------------
# wave executor: the schedule running on the real MC kernels
# ------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _wave_step(uw: int, uh: int, bitdepth: int):
    import jax
    import jax.numpy as jnp
    from ..ops.mc_tpu import mc_unit_batch

    @jax.jit
    def step(stack, src, dst, dy, dx, oy, ox, mx, my, f2d):
        # every unit reads its source frame's plane out of the carried
        # stack and writes its destination frame's plane back into it;
        # pad rows carry dy == PAD_OOB so their scatter drops entirely
        pred = mc_unit_batch((stack, src, oy, ox, mx, my, f2d),
                             uw, uh, True, True, bitdepth, False)
        yy = dy[:, None, None] + jnp.arange(uh)[None, :, None]
        xx = dx[:, None, None] + jnp.arange(uw)[None, None, :]
        return stack.at[dst[:, None, None], yy, xx].set(
            pred.astype(stack.dtype))
    return step


def run_banded_chain(ref0, frame_units, n_bands: int, band_rows: int,
                     pad: int, uw: int, uh: int, bitdepth: int = 8,
                     sequential: bool = False, mesh=None):
    """Reconstruct a chain of F inter frames, each motion-compensated
    from its predecessor, on the ``plan_row_waves`` schedule — the live
    form of dav1d's frame-threading row gates (src/thread_task.c:403).

    ref0: (H, W) int32 plane frame 0 predicts from.  frame_units[f]:
    (N, 7) int32 rows [dst_y, dst_x, oy, ox, mx, my, f2d] — MC units of
    frame f reading frame f-1 (frame 0 reads ref0).  Every unit's read
    window must satisfy oy + uh + 7 <= (dst_y // band_rows + pad + 1) *
    band_rows, i.e. ``pad`` from ``mv_row_pad`` of the stream's MV
    bound.  Each wave is ONE fused device dispatch covering every
    (frame, band) member — cross-frame overlap with zero runtime
    synchronization.  ``sequential=True`` ignores the overlap and runs
    frame-major band-major (the correctness anchor for tests).
    ``mesh``: optional jax Mesh — the wave's unit batch is sharded over
    its first axis (GSPMD inserts the gather/scatter collectives).

    Returns (F, H, W) int32 reconstructed frames."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ..ops.mc_tpu import PAD_OOB

    F = len(frame_units)
    H, W = ref0.shape
    deps = [[]] + [[f - 1] for f in range(1, F)]
    if sequential:
        waves = [[(f, r)] for f in range(F) for r in range(n_bands)]
    else:
        waves = plan_row_waves(deps, n_bands, pad)
        check_waves(waves, deps, n_bands, pad)

    by_band = {}
    for f, us in enumerate(frame_units):
        us = np.asarray(us, np.int32)
        band = us[:, 0] // band_rows
        for r in range(n_bands):
            by_band[(f, r)] = us[band == r]

    wave_rows = []
    for members in waves:
        rows = np.concatenate([by_band[m] for m in members])
        srcs = np.concatenate([np.full(len(by_band[m]), m[0], np.int32)
                               for m in members])
        wave_rows.append((rows, srcs))
    bmax = max(len(r) for r, _ in wave_rows)
    bmax = max(1 << (bmax - 1).bit_length(), 8)

    step = _wave_step(uw, uh, bitdepth)
    stack = jnp.zeros((F + 1, H, W), jnp.int32).at[0].set(
        jnp.asarray(ref0.astype(np.int32)))
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        stack = jax.device_put(stack, NamedSharding(mesh, P()))
    for rows, srcs in wave_rows:
        padn = bmax - len(rows)
        rows = np.concatenate([rows, np.zeros((padn, 7), np.int32)])
        rows[len(rows) - padn:, 0] = PAD_OOB
        srcs = np.concatenate([srcs, np.zeros(padn, np.int32)])
        args = [jnp.asarray(a) for a in
                (srcs, srcs + 1, rows[:, 0], rows[:, 1], rows[:, 2],
                 rows[:, 3], rows[:, 4], rows[:, 5], rows[:, 6])]
        if shard is not None:
            args = [jax.device_put(a, shard) for a in args]
        stack = step(stack, *args)
    return stack[1:]
