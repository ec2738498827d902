#!/usr/bin/env python
"""Pre-generate the bench e2e streams into bench_cache/ (committed).

bench.py must never pay the Python-encoder cost for its e2e streams at
measurement time (generating 1080p/4K streams takes ~15s each on this
1-core host and contributed to round 2's bench timeout). Run this after
changing E2E_CONFIGS or the stream generator, then commit bench_cache/.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import bench  # noqa: E402


def main():
    os.makedirs(bench.STREAM_CACHE, exist_ok=True)
    for name, cfg in bench.E2E_CONFIGS.items():
        data = bench._bench_stream(name, cfg, seed=9)
        print(f"{name}: {len(data)} bytes")
    print(f"cached in {bench.STREAM_CACHE}")


if __name__ == "__main__":
    main()
