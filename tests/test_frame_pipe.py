"""GOP dependency leveling + frame-axis sharded MC fanout."""
import numpy as np
import pytest

import jax

from dav1d_mirror_tpu.parallel.frame_pipe import (plan_gop_levels,
                                                  fanout_gop_mc)
from dav1d_mirror_tpu.ops.mc_tpu import mc_unit_batch


class _F:
    def __init__(self, ftype, refidx=None, refresh=0):
        self.frame_type = ftype
        self.refidx = refidx or [0] * 7
        self.refresh_frame_flags = refresh


def test_plan_gop_levels_key_fanout():
    """KEY writes all slots; 3 P-frames referencing only the key are one
    parallel level; a frame referencing a P goes to the next level."""
    frames = [
        _F(0, refresh=0xFF),                       # key -> level 0
        _F(1, refidx=[0] * 7, refresh=1 << 1),     # P1 (refs key)
        _F(1, refidx=[0] * 7, refresh=1 << 2),     # P2 (refs key)
        _F(1, refidx=[0] * 7, refresh=0),          # P3 (refs key)
        _F(1, refidx=[1] * 7, refresh=0),          # P4 (refs P1's slot)
    ]
    levels = plan_gop_levels(frames)
    assert levels == [[0], [1, 2, 3], [4]]


def test_plan_gop_levels_chain():
    frames = [
        _F(0, refresh=0xFF),
        _F(1, refidx=[0] * 7, refresh=1),          # overwrites slot 0
        _F(1, refidx=[0] * 7, refresh=1),          # refs prev P
    ]
    assert plan_gop_levels(frames) == [[0], [1], [2]]


def test_fanout_gop_mc_matches_single_device():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("frame",))

    rng = np.random.default_rng(3)
    H = W = 96
    refs = rng.integers(0, 255, (7, H, W)).astype(np.int32)
    F, N, uw, uh = 8, 24, 8, 8
    units = np.stack([np.stack([
        rng.integers(0, 7, N), rng.integers(-3, H - uh, N),
        rng.integers(-3, W - uw, N), rng.integers(1, 16, N) & ~1,
        rng.integers(1, 16, N) & ~1, rng.integers(0, 9, N)],
        axis=1) for _ in range(F)]).astype(np.int32)

    got = np.asarray(fanout_gop_mc(mesh, refs, units, uw, uh, True, True,
                                   8))
    import jax.numpy as jnp
    for f in range(F):
        u = units[f]
        want = np.asarray(mc_unit_batch(
            (jnp.asarray(refs), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
             jnp.asarray(u[:, 2]), jnp.asarray(u[:, 3]),
             jnp.asarray(u[:, 4]), jnp.asarray(u[:, 5])),
            uw, uh, True, True, 8, False))
        np.testing.assert_array_equal(got[f], want, err_msg=f"frame {f}")
