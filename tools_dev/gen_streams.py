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
    from test_e2e_multitile import build_stream as multitile_stream
    from dav1d_mirror_tpu.host import headers as h

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
        # feature-axis coverage (each exercises a distinct kernel/path)
        "inter_warp_obmc.ivf": lambda: inter_stream(
            dict(warp=True, swmotion=True, txsw=True,
                 lf=(20, 20, 15, 15, 0)), 10)[1],
        "inter_masked.ivf": lambda: inter_stream(
            dict(comp=True, masked=1, txsw=True,
                 lf=(25, 25, 18, 18, 1)), 11)[1],
        "inter_superres.ivf": lambda: inter_stream(
            dict(sr=12, txsw=True), 12)[1],
        "inter_tmvs_skip.ivf": lambda: inter_stream(
            dict(order_hint=1, tmvs=True, comp=True, skipmode=True,
                 txsw=True), 13)[1],
        "inter_10bit_lr.ivf": lambda: inter_stream(
            dict(bitdepth=10, lr=(2, 3, 1), lf=(18, 18, 12, 12, 0),
                 txsw=True), 14)[1],
        "inter_444_masked.ivf": lambda: inter_stream(
            dict(comp=True, masked=1, layout=h.PIXEL_LAYOUT_I444), 15)[1],
        "intra_filter_pal.ivf": lambda: intra_stream(
            dict(w=64, h=64, q=60, fi=1, scc=1, txsw=True,
                 cdef=dict(damping=3, n_bits=1, y_strength=[4, 21],
                           uv_strength=[2, 9])), 16)[2],
        "intra_sb128_lr.ivf": lambda: intra_stream(
            dict(w=128, h=128, q=100, lr=(1, 0, 3), sb128=1, txsw=True,
                 lf=(25, 25, 20, 20, 0)), 17)[2],
        "multitile_2x2.ivf": lambda: multitile_stream(
            dict(w=128, h=128, tiles=(1, 1),
                 lf=(35, 30, 25, 20, 2)), 18)[1],
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
