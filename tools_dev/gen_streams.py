#!/usr/bin/env python
"""Regenerate the checked-in smoke-stream corpus (tests/streams/).

Small conformant AV1 streams produced by the symmetric coder, each with
its reference-decoder md5 recorded in tests/streams/md5.txt. Used for
quick CLI verification (`python -m dav1d_mirror_tpu.cli -i X.ivf
--verify <md5>`) without regenerating streams, e.g. by the /verify
skill. Run from the repo root:

    python tools_dev/gen_streams.py
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "streams")
ORACLE = os.path.join(os.path.dirname(OUT), os.pardir, "oracle", "build",
                      "dav1d")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from test_e2e_inter import build_stream as inter_stream
    from test_e2e_intra import build_stream as intra_stream

    os.makedirs(OUT, exist_ok=True)
    streams = {
        "intra_420_8bit.ivf": lambda: intra_stream(
            dict(w=64, h=64, q=100, txsw=True,
                 lf=(32, 32, 24, 20, 0)), 5)[2],
        "intra_444_10bit.ivf": lambda: intra_stream(
            dict(w=64, h=64, q=100, bitdepth=10, layout=3), 6)[2],
        "inter_basic.ivf": lambda: inter_stream(dict(txsw=True), 7)[1],
        "inter_compound_oh.ivf": lambda: inter_stream(
            dict(order_hint=1, comp=True, jnt=1, txsw=True), 8)[1],
        "inter_grain.ivf": lambda: inter_stream(
            dict(fg=dict(seed=3, num_y_points=2,
                         y_points=[(0, 50), (255, 40)], ar_coeff_lag=1,
                         ar_coeffs_y=[2, -5, 9, 4], scaling_shift=9,
                         overlap_flag=1)), 9)[1],
    }
    lines = []
    for name, gen in streams.items():
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(gen())
        r = subprocess.run([ORACLE, "-i", path, "--muxer", "md5",
                            "-o", "-"], capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stderr)
        md5 = r.stdout.strip()
        lines.append(f"{md5}  {name}")
        print(lines[-1])
    with open(os.path.join(OUT, "md5.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
