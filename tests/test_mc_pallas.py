"""Two-stage MC (H-plane precompute + vertical pass) vs the reference
single-stage window kernel, bit-exact.

On CPU this exercises the XLA fallback path; when a TPU backend is
present (the driver's bench environment) mc_hv_batch routes through the
Pallas DMA kernels in ops/mc_pallas, which are validated bit-exact
against the same reference on hardware."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dav1d_mirror_tpu.ops.mc_tpu import (mc_unit_batch, mc_hv_batch,
                                         mc_hplanes)
from dav1d_mirror_tpu.ops import mc_pallas


@pytest.mark.parametrize("bd", [8, 10, 12])
@pytest.mark.parametrize("shape", [(8, 8), (4, 8), (8, 4), (4, 4)])
@pytest.mark.parametrize("prep", [False, True])
def test_two_stage_mc_matches_window_kernel(bd, shape, prep):
    uw, uh = shape
    rng = np.random.default_rng(bd * 100 + uw * 10 + uh + prep)
    H, W = 96, 128
    refs = jnp.asarray(rng.integers(0, (1 << bd) - 1, (7, H, W)),
                       jnp.int32)
    n = 250
    # origins far outside the frame exercise the clamp/pad equivalences
    arr = np.stack([rng.integers(0, 7, n), rng.integers(-50, H + 30, n),
                    rng.integers(-50, W + 30, n), rng.integers(1, 16, n),
                    rng.integers(1, 16, n), rng.integers(0, 9, n)],
                   1).astype(np.int32)
    want = np.asarray(mc_unit_batch(
        (refs, *(jnp.asarray(arr[:, i]) for i in range(6))),
        uw, uh, True, True, bd, prep))
    got = np.asarray(mc_hv_batch(refs, arr, uw, uh, bd, prep))
    np.testing.assert_array_equal(got, want)


def test_pallas_hplanes_matches_xla_when_available():
    if not mc_pallas.pallas_available():
        pytest.skip("no TPU backend for Mosaic kernels")
    rng = np.random.default_rng(0)
    refs = jnp.asarray(rng.integers(0, 255, (7, 96, 130)), jnp.int32)
    combos = np.stack([rng.integers(0, 7, 24), rng.integers(0, 6, 24),
                       rng.integers(1, 16, 24)], 1).astype(np.int32)
    a = np.asarray(mc_hplanes(refs, jnp.asarray(combos), 8))
    hs, remap = mc_pallas.mc_hplanes_pallas(refs, combos, 8)
    b = np.asarray(hs)[remap]
    np.testing.assert_array_equal(a, b)
