"""Golden tests: NumPy itx reference vs the reference decoder's C kernels."""
import numpy as np
import pytest

from dav1d_mirror_tpu.ops.itx_meta import (TX_INFO, allowed_txtypes, WHT_WHT,
                                           DCT_DCT)
from dav1d_mirror_tpu.ops.ref.itx import inv_txfm_add_ref

import oracle_dsp

pytestmark = pytest.mark.skipif(not oracle_dsp.have_oracle(),
                                reason="oracle dsp lib not built")

ALL_CASES = [(tx, txtp) for tx in TX_INFO for txtp in allowed_txtypes(tx)]


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("tx,txtp", ALL_CASES)
def test_itx_add_matches_oracle(tx, txtp, bitdepth):
    w, h, _ = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    rng = np.random.default_rng(1234 + tx * 100 + txtp + bitdepth)
    # coefficient magnitude: stay within spec-compliant dequant output range
    cmax = (1 << (bitdepth + 5)) - 1
    for trial in range(4):
        coeff = rng.integers(-cmax, cmax + 1, size=(sh, sw)).astype(np.int32)
        if trial == 1:
            # sparse: only dc
            coeff[:] = 0
            coeff[0, 0] = rng.integers(-cmax, cmax + 1)
        if trial == 2:
            coeff[:, sw // 2:] = 0
            coeff[sh // 2:, :] = 0
        dst = rng.integers(0, (1 << bitdepth), size=(h, w)).astype(
            np.uint16 if bitdepth > 8 else np.uint8)
        eob = 0 if trial == 1 else sw * sh - 1
        ref = oracle_dsp.itx_add(dst.copy(), coeff.copy(), eob, tx, txtp,
                                 bitdepth)
        got = inv_txfm_add_ref(dst.copy(), coeff.copy(), eob, tx, txtp,
                               bitdepth)
        np.testing.assert_array_equal(got, ref,
                                      err_msg=f"tx={tx} txtp={txtp} "
                                              f"bd={bitdepth} trial={trial}")


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_itx_dconly_path(bitdepth):
    rng = np.random.default_rng(7)
    for tx in TX_INFO:
        w, h, _ = TX_INFO[tx]
        sw, sh = min(w, 32), min(h, 32)
        coeff = np.zeros((sh, sw), np.int32)
        coeff[0, 0] = int(rng.integers(-(1 << (bitdepth + 5)),
                                       1 << (bitdepth + 5)))
        dst = rng.integers(0, (1 << bitdepth), size=(h, w)).astype(
            np.uint16 if bitdepth > 8 else np.uint8)
        ref = oracle_dsp.itx_add(dst.copy(), coeff.copy(), 0, tx, DCT_DCT,
                                 bitdepth)
        got = inv_txfm_add_ref(dst.copy(), coeff.copy(), 0, tx, DCT_DCT,
                               bitdepth)
        np.testing.assert_array_equal(got, ref, err_msg=f"tx={tx}")
