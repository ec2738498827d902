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
