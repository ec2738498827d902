"""TPU film grain synthesis vs the host reference, bit-exact.

The host reference (ops/ref/filmgrain.py) is itself verified against the
oracle via the film-grain e2e configs; this locks the device kernel to
it across layouts, bit depths and feature flags, plus one full-stream
decode with --tpu filters against the oracle md5.
"""
import numpy as np
import pytest

from dav1d_mirror_tpu.ops.ref.filmgrain import apply_film_grain
from dav1d_mirror_tpu.ops.filmgrain_tpu import apply_film_grain_tpu


class _O:
    pass


def _mk(seed=1234, bitdepth=8, layout=1, overlap=1, csfl=0, clip=0,
        nuv=(2, 2), ny=3, lag=2, w=67, h=53, mtrx=1):
    fgd = _O()
    fgd.seed = seed
    fgd.num_y_points = ny
    fgd.y_points = [(0, 40), (120, 90), (255, 25)][:ny]
    fgd.num_uv_points = list(nuv)
    fgd.uv_points = [[(0, 30), (255, 60)], [(0, 50), (128, 20)]]
    fgd.chroma_scaling_from_luma = csfl
    fgd.scaling_shift = 9
    fgd.ar_coeff_lag = lag
    n_y = 2 * lag * (lag + 1)
    rng = np.random.default_rng(seed)
    fgd.ar_coeffs_y = rng.integers(-20, 20, n_y).tolist()
    fgd.ar_coeffs_uv = [rng.integers(-20, 20, n_y + 1).tolist(),
                        rng.integers(-20, 20, n_y + 1).tolist()]
    fgd.ar_coeff_shift = 7
    fgd.grain_scale_shift = 0
    fgd.uv_mult = [25, -10]
    fgd.uv_luma_mult = [40, 60]
    fgd.uv_offset = [-30, 101]
    fgd.overlap_flag = overlap
    fgd.clip_to_restricted_range = clip
    seq = _O()
    seq.bitdepth = bitdepth
    seq.layout = layout
    seq.mtrx = mtrx
    hdr = _O()
    hdr.film_grain_data = fgd
    ssx = 1 if layout != 3 else 0
    ssy = 1 if layout == 1 else 0
    pw, ph = w + (w & ssx), h + (h & ssy)
    planes = [rng.integers(0, (1 << bitdepth) - 1,
                           (ph, pw)).astype(np.int32)]
    if layout:
        cw, ch = (w + ssx) >> ssx, (h + ssy) >> ssy
        for _ in range(2):
            planes.append(rng.integers(0, (1 << bitdepth) - 1,
                                       (ch, cw)).astype(np.int32))
    return planes, seq, hdr, w, h


CASES = [
    dict(), dict(overlap=0), dict(bitdepth=10), dict(layout=2),
    dict(layout=3), dict(layout=0), dict(csfl=1), dict(clip=1),
    dict(ny=0), dict(nuv=(0, 0)), dict(nuv=(2, 0)),
    dict(lag=3, bitdepth=10, layout=3), dict(w=64, h=64),
    dict(w=96, h=33, bitdepth=12), dict(mtrx=0, clip=1),
]


@pytest.mark.parametrize("kw", CASES)
def test_filmgrain_tpu_matches_reference(kw):
    planes, seq, hdr, w, h = _mk(**kw)
    ref = apply_film_grain(planes, seq, hdr, w, h)
    tpu = apply_film_grain_tpu(planes, seq, hdr, w, h)
    for a, b in zip(ref, tpu):
        assert np.array_equal(a, b)


def test_filmgrain_tpu_e2e_oracle(oracle_bin, tmp_path):
    """Full stream with film grain decoded with --tpu path == oracle."""
    import subprocess
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_e2e_inter import build_stream
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    fg = dict(seed=911, num_y_points=3,
              y_points=[(0, 40), (80, 90), (255, 20)], ar_coeff_lag=1,
              ar_coeffs_y=[3, -7, 12, 5], scaling_shift=8, overlap_flag=1)
    _, ivf, _ = build_stream(dict(fg=fg, txsw=True), seed=5)
    p = tmp_path / "fg.ivf"
    p.write_bytes(ivf)
    # the reference CLI disables grain by default for the md5 muxer
    # (tools/dav1d_cli_parse.c:440); force it on to hash grained output
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "--filmgrain", "1", "-o", "-"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    want = r.stdout.strip()

    dec = api.Decoder(api.Settings(use_tpu_filters=True))
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    assert mux.digest() == want
