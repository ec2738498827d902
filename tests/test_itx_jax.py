"""JAX batched itx vs NumPy reference (which is itself oracle-verified)."""
import numpy as np
import pytest

from dav1d_mirror_tpu.ops.itx_meta import TX_INFO, allowed_txtypes
from dav1d_mirror_tpu.ops.ref.itx import inv_txfm_add_ref
from dav1d_mirror_tpu.ops.itx import itx_add

# the large-transform jits (32x32/64-wide sizes) dominate suite runtime;
# they run in the slow tier
_SLOW_TX = {3, 4, 9, 10, 11, 12, 17, 18}
CASES = [pytest.param(tx, txtp,
                      marks=[pytest.mark.slow] if tx in _SLOW_TX else [])
         for tx in TX_INFO for txtp in allowed_txtypes(tx)]


@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("tx,txtp", CASES)
def test_itx_jax_matches_ref(tx, txtp, bitdepth):
    w, h, _ = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    B = 3
    rng = np.random.default_rng(99 + tx * 31 + txtp)
    cmax = (1 << (bitdepth + 5)) - 1
    coefs = rng.integers(-cmax, cmax + 1, size=(B, sh, sw)).astype(np.int32)
    coefs[1] = 0
    coefs[1, 0, 0] = 1234
    pred = rng.integers(0, 1 << bitdepth, size=(B, h, w)).astype(np.int32)

    got = np.asarray(itx_add(pred, coefs, tx, txtp, bitdepth))

    pix_t = np.uint8 if bitdepth == 8 else np.uint16
    for b in range(B):
        ref = inv_txfm_add_ref(pred[b].astype(pix_t), coefs[b],
                               sw * sh - 1, tx, txtp, bitdepth)
        np.testing.assert_array_equal(got[b], ref.astype(np.int32),
                                      err_msg=f"b={b} tx={tx} txtp={txtp}")
