"""JAX batched itx vs NumPy reference (which is itself oracle-verified)."""
import numpy as np
import pytest

from dav1d_mirror_tpu.ops.itx_meta import TX_INFO, allowed_txtypes
from dav1d_mirror_tpu.ops.ref.itx import inv_txfm_add_ref
from dav1d_mirror_tpu.ops.itx import itx_add

# the large-transform jits (32x32/64-wide sizes) dominate suite runtime
# (>20 min of CPU compiles for the full matrix): the slow tier keeps
# one representative per large size class; the rest are xslow
_SLOW_TX = {3, 4, 9, 10, 11, 12, 17, 18}
_SLOW_REP = {(3, 0), (17, 0)}   # 32x32 + 64x64 dct_dct


def _tier(tx, txtp):
    if tx not in _SLOW_TX:
        return []
    return [pytest.mark.slow] if (tx, txtp) in _SLOW_REP \
        else [pytest.mark.xslow]


CASES = [pytest.param(tx, txtp, marks=_tier(tx, txtp))
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


_MULTI_FAST = {0, 1, 6, 8}      # 4x4, 8x8, 8x4, 8x16: default tier


@pytest.mark.parametrize(
    "tx,bitdepth",
    [pytest.param(tx, bd,
                  marks=() if (tx in _MULTI_FAST and bd == 8)
                  else (pytest.mark.slow,) if tx in _MULTI_FAST
                  else (pytest.mark.xslow,))
     for tx in sorted(TX_INFO) for bd in (8, 10)])
def test_itx_multi_matches_per_type(tx, bitdepth):
    # type-as-data kernel (ops/itx.py itx_residual_multi): one program
    # per tx SIZE must reproduce every (tx, txtp) bucket bit-exactly
    from dav1d_mirror_tpu.ops.itx import (itx_residual, itx_residual_multi,
                                          itx_multi_sel)
    from dav1d_mirror_tpu.ops.itx_meta import WHT_WHT
    rng = np.random.default_rng(1234 + tx)
    types = [t for t in allowed_txtypes(tx) if t != WHT_WHT]
    w, h, _ = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    B = 3 * len(types)
    mx = (1 << (bitdepth + 7)) - 1
    coefs = rng.integers(-mx, mx + 1, (B, sh, sw)).astype(np.int32)
    txtps = np.asarray([types[i % len(types)] for i in range(B)])
    sels = np.asarray([itx_multi_sel(tx, t) for t in txtps], np.int32)
    got = np.asarray(itx_residual_multi(coefs, sels[:, 0], sels[:, 1],
                                        tx, bitdepth))
    for t in types:
        idx = np.nonzero(txtps == t)[0]
        want = np.asarray(itx_residual(coefs[idx], tx, int(t), bitdepth))
        np.testing.assert_array_equal(got[idx], want,
                                      err_msg=f"tx={tx} txtp={t}")
