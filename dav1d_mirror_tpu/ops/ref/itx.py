"""NumPy reference for the inverse transform + add stage (bit-exact).

Matches the reference decoder's generic 2D composer (dav1d
`src/itx_tmpl.c:40-100`): row 1D pass with rect2 pre-scale, intermediate
round-shift + clip, column 1D pass, final (+8)>>4 add-and-clip, with the
dc-only fast path for DCT_DCT at eob 0 and the WHT special case.

Used as the test reference for the JAX batched kernel and as a host-side
fallback in the scalar decoder.
"""
from __future__ import annotations

import numpy as np

from ..itx_1d import get_1d_fn, iwht4
from ..itx_meta import TX_INFO, TXTYPE_TO_1D, DCT_DCT, WHT_WHT


def clip_ranges(bitdepth: int):
    """(row_min, row_max, col_min, col_max) intermediate clip bounds."""
    if bitdepth == 8:
        return -32768, 32767, -32768, 32767
    bd_max = (1 << bitdepth) - 1
    row_min = -((bd_max + 1) << 7)
    col_min = -((bd_max + 1) << 5)
    return row_min, ~row_min, col_min, ~col_min


def _transform_axis(arr, fn, mn, mx, n_out):
    """Apply 1D fn along axis 0 of int64->int32 array arr (n_in, M)."""
    vecs = [arr[k] for k in range(arr.shape[0])]
    out = fn(vecs, mn, mx)
    assert len(out) == n_out
    return np.stack(out, axis=0)


def inv_txfm_add_ref(dst: np.ndarray, coeff: np.ndarray, eob: int, tx: int,
                     txtp: int, bitdepth: int) -> np.ndarray:
    """dst: (h, w) uint8/uint16; coeff: (sh, sw) int32 where
    coeff[y, x] is the dequantized coefficient for row y, col x (already
    de-transposed from the scan buffer). Returns new dst."""
    w, h, shift = TX_INFO[tx]
    sw, sh = min(w, 32), min(h, 32)
    assert coeff.shape == (sh, sw)
    bd_max = (1 << bitdepth) - 1
    rnd = (1 << shift) >> 1
    dst = dst.astype(np.int32)

    if txtp == WHT_WHT:
        c = (coeff.astype(np.int32) >> 2)
        # row pass along x (batched over rows), then col pass along y
        tmp = np.stack(iwht4([c[:, x] for x in range(4)]), axis=1)  # (4, 4)
        res = np.stack(iwht4([tmp[y, :] for y in range(4)]), axis=0)
        return np.clip(dst + res, 0, bd_max).astype(
            np.uint8 if bitdepth == 8 else np.uint16)

    is_rect2 = (w * 2 == h) or (h * 2 == w)
    has_dconly = 1 if txtp == DCT_DCT else 0

    if eob < has_dconly:
        dc = int(coeff[0, 0])
        if is_rect2:
            dc = (dc * 181 + 128) >> 8
        dc = (dc * 181 + 128) >> 8
        dc = (dc + rnd) >> shift
        dc = (dc * 181 + 128 + 2048) >> 12
        return np.clip(dst + dc, 0, bd_max).astype(
            np.uint8 if bitdepth == 8 else np.uint16)

    row_fam, col_fam = TXTYPE_TO_1D[txtp]
    row_min, row_max, col_min, col_max = clip_ranges(bitdepth)

    c = coeff.astype(np.int32)
    if is_rect2:
        c = (c * 181 + 128) >> 8

    # row pass: transform along x; batch over the sh rows
    row_fn = get_1d_fn(row_fam, w)
    arr = c.T.copy()  # (sw, sh): axis0 = x (64-pt transforms take 32 inputs)
    tmp = _transform_axis(arr, row_fn, row_min, row_max, w)
    # tmp: (w, sh)

    tmp = np.clip((tmp + rnd) >> shift, col_min, col_max)

    # col pass: transform along y; batch over all w columns
    col_fn = get_1d_fn(col_fam, h)
    arr = tmp.T.copy()  # (sh, w): axis0 = y
    out = _transform_axis(arr, col_fn, col_min, col_max, h)
    # out: (h, w)

    res = (out + 8) >> 4
    return np.clip(dst + res, 0, bd_max).astype(
        np.uint8 if bitdepth == 8 else np.uint16)
