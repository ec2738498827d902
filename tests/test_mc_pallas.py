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


@pytest.mark.parametrize("shape", [(8, 8), (4, 8), (8, 4), (4, 4)])
def test_vpass_prep_compact_matches_full(shape):
    """The compact per-unit descriptor form (int16-safe scalars expanded
    to tap lanes on DEVICE via vpass_cols_device) must reproduce exactly
    the columns the full host-side vpass_prep builds — backend-free
    check, runs on CPU."""
    uw, uh = shape
    rng = np.random.default_rng(uw * 10 + uh)
    H, W = 96, 128
    Hh = 2 * H + 10
    n = 57        # deliberately not a CHUNK multiple (exercises padding)
    arr = np.stack([rng.integers(0, 7, n), rng.integers(-50, H + 30, n),
                    rng.integers(-50, W + 30, n), rng.integers(1, 16, n),
                    rng.integers(1, 16, n), rng.integers(0, 9, n)],
                   1).astype(np.int32)
    tv = rng.integers(0, 3, n).astype(np.int32)
    slot = rng.integers(0, 24, n).astype(np.int32)
    full, bf = mc_pallas.vpass_prep(slot, arr, tv, uw, uh, Hh, W)
    comp, bc = mc_pallas.vpass_prep_compact(slot, arr, tv, uw, uh, Hh, W)
    assert bf == bc
    for a, b in zip(full[:5], comp[:5]):
        np.testing.assert_array_equal(a, b)
        # int16-safety: the compact form ships on the 16-bit side buffer
        assert np.all(np.abs(b) < (1 << 15))
    for c in comp[5:]:
        assert np.all(np.abs(c) < (1 << 15))
    fv = np.asarray(mc_pallas.vpass_cols_device(
        jnp.asarray(comp[5]), jnp.asarray(comp[6]), uw))
    np.testing.assert_array_equal(fv, full[5])
