"""Flagship jittable reconstruction step (grows as the pipeline widens).

Currently: batched dequantized-coefficient -> inverse transform -> add-clip
for one (tx_size, tx_type) bucket. The full frame pipeline composes several
of these buckets plus prediction and the in-loop filters.
"""
from __future__ import annotations

import jax

from ..ops.itx import itx_add
from ..ops.itx_meta import TX_16X16, DCT_DCT


def recon_step(pred: jax.Array, coefs: jax.Array, bitdepth: int = 8,
               tx: int = TX_16X16, txtp: int = DCT_DCT) -> jax.Array:
    return itx_add(pred, coefs, tx, txtp, bitdepth)
