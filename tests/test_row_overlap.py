"""Row-granular cross-frame overlap schedule (parallel/row_overlap):
the static form of dav1d's lowest-pixel row gating
(src/thread_task.c:403-431), SURVEY §5.7's ring-attention analogue."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from dav1d_mirror_tpu.parallel.row_overlap import (  # noqa: E402
    plan_row_waves, check_waves, mv_row_pad, pipeline_depth)


def test_chain_pipelines_diagonally():
    """F dependent frames x B bands: depth F + (B-1) + (F-1)*pad-ish,
    strictly better than the F*B of whole-frame leveling."""
    F, B, pad = 4, 16, 1
    deps = [[]] + [[f - 1] for f in range(1, F)]
    waves = plan_row_waves(deps, B, pad)
    check_waves(waves, deps, B, pad)
    depth = pipeline_depth(waves)
    assert depth < F * B            # overlap happened
    # a frame's band 0 starts pad+1 waves after its ref's band 0
    flat = {(f, r): w for w, ms in enumerate(waves) for f, r in ms}
    assert flat[(1, 0)] == flat[(0, 0)] + pad + 1
    assert flat[(F - 1, B - 1)] == depth - 1
    # every band appears exactly once
    assert len(flat) == F * B


def test_independent_frames_share_waves():
    """Frames of one GOP level (same deps) run their equal bands in the
    SAME wave — the frame-axis fan-out dimension."""
    deps = [[], [0], [0], [1, 2]]
    waves = plan_row_waves(deps, 8, 2)
    check_waves(waves, deps, 8, 2)
    flat = {(f, r): w for w, ms in enumerate(waves) for f, r in ms}
    for r in range(8):
        assert flat[(1, r)] == flat[(2, r)]


def test_mv_row_pad_bounds():
    # spec-bound MV (1<<13 eighth-pels = 1024 px) over 64-row bands
    assert mv_row_pad(1 << 13, 64) == 17
    # measured tiny motion: one band of slack
    assert mv_row_pad(64, 64) == 1
    # zero motion still needs the filter reach
    assert mv_row_pad(0, 64) == 1


def test_keyframe_restarts_pipeline():
    deps = [[], [0], [], [2]]      # two 2-frame GOPs
    B, pad = 4, 1
    waves = plan_row_waves(deps, B, pad)
    check_waves(waves, deps, B, pad)
    flat = {(f, r): w for w, ms in enumerate(waves) for f, r in ms}
    # the second keyframe doesn't wait for GOP 1 at all
    assert flat[(2, 0)] == 0
