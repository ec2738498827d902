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


def _chain_units(F, H, W, band_rows, pad, uw, uh, seed=0):
    """Random per-frame MC unit grids whose read reach respects the
    band gate: oy + uh + 7 <= (band + pad + 1) * band_rows."""
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(F):
        rows = []
        for dy in range(0, H - uh + 1, uh):
            for dx in range(0, W - uw + 1, uw):
                band = dy // band_rows
                lo = -16                      # reads above: always done
                hi = (band + pad + 1) * band_rows - uh - 7
                oy = int(rng.integers(lo, max(hi, lo + 1)))
                ox = int(rng.integers(-8, W - uw))
                rows.append((dy, dx, oy, ox,
                             int(rng.integers(1, 16)),
                             int(rng.integers(1, 16)),
                             int(rng.integers(0, 9))))
        frames.append(np.asarray(rows, np.int32))
    return frames


def test_banded_chain_bit_exact():
    """Overlapped wave execution == sequential frame-by-frame decode on
    the real 8-tap MC kernel: the schedule's dependency property holds
    on actual pixels, not just on the wave graph."""
    from dav1d_mirror_tpu.parallel.row_overlap import run_banded_chain
    F, H, W, band_rows, pad, uw, uh = 3, 64, 64, 16, 1, 8, 8
    rng = np.random.default_rng(3)
    ref0 = rng.integers(0, 256, (H, W)).astype(np.int32)
    frames = _chain_units(F, H, W, band_rows, pad, uw, uh)
    seq = np.asarray(run_banded_chain(ref0, frames, H // band_rows,
                                      band_rows, pad, uw, uh,
                                      sequential=True))
    ovl = np.asarray(run_banded_chain(ref0, frames, H // band_rows,
                                      band_rows, pad, uw, uh))
    np.testing.assert_array_equal(seq, ovl)


def test_banded_chain_on_mesh():
    """Same schedule with each wave's unit batch sharded over an 8-device
    mesh (GSPMD gathers/scatters across devices); still bit-exact."""
    import jax
    from jax.sharding import Mesh
    from dav1d_mirror_tpu.parallel.row_overlap import run_banded_chain
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    F, H, W, band_rows, pad, uw, uh = 2, 64, 64, 16, 1, 8, 8
    rng = np.random.default_rng(5)
    ref0 = rng.integers(0, 256, (H, W)).astype(np.int32)
    frames = _chain_units(F, H, W, band_rows, pad, uw, uh, seed=11)
    base = np.asarray(run_banded_chain(ref0, frames, H // band_rows,
                                       band_rows, pad, uw, uh))
    mesh = Mesh(np.array(jax.devices()[:8]), ("u",))
    sh = np.asarray(run_banded_chain(ref0, frames, H // band_rows,
                                     band_rows, pad, uw, uh, mesh=mesh))
    np.testing.assert_array_equal(base, sh)


def test_keyframe_restarts_pipeline():
    deps = [[], [0], [], [2]]      # two 2-frame GOPs
    B, pad = 4, 1
    waves = plan_row_waves(deps, B, pad)
    check_waves(waves, deps, B, pad)
    flat = {(f, r): w for w, ms in enumerate(waves) for f, r in ms}
    # the second keyframe doesn't wait for GOP 1 at all
    assert flat[(2, 0)] == 0
