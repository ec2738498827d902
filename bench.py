#!/usr/bin/env python
"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current benchmark: device reconstruction throughput on a synthetic
1080p-equivalent workload (dequantized 16x16 DCT_DCT blocks covering a
1920x1088 luma plane + 4:2:0 chroma), measured as megapixels of reconstructed
video per second. This grows into full-stream decode fps as the pipeline
widens; `vs_baseline` is the ratio vs the reference decoder's single-thread
CPU throughput on the same machine when measurable (0.0 = not yet measured).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dav1d_mirror_tpu.models.recon_step import recon_step

    # 1080p 4:2:0 frame worth of 16x16 blocks: (1920*1088 * 1.5) / 256
    n_blocks = int(1920 * 1088 * 1.5) // 256
    rng = np.random.default_rng(0)
    coefs = jnp.asarray(rng.integers(-2047, 2048, size=(n_blocks, 16, 16)),
                        dtype=jnp.int32)
    pred = jnp.asarray(rng.integers(0, 256, size=(n_blocks, 16, 16)),
                       dtype=jnp.int32)

    step = jax.jit(lambda p, c: recon_step(p, c, bitdepth=8))
    out = step(pred, coefs)
    out.block_until_ready()  # compile

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(pred, coefs)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    mpix = n_blocks * 256 * iters / dt / 1e6
    fps_1080p_equiv = mpix * 1e6 / (1920 * 1088 * 1.5)
    print(json.dumps({
        "metric": "recon_Mpix_per_sec",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": 0.0,
        "detail": {"fps_1080p_equiv": round(fps_1080p_equiv, 2),
                   "device": str(jax.devices()[0]),
                   "stage": "itx16x16+add"},
    }))


if __name__ == "__main__":
    main()
