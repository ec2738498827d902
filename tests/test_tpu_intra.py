"""Device residual path on intra/keyframe content, bit-exact vs oracle.

Intra prediction is sequential (neighbour dependency), but the inverse
transforms — the FLOPs — depend only on coefficients; the device pass
batch-computes them (models/tpu_inter residual map) and the host walk
consumes them instead of running numpy itx per block. These configs hit
all tx classes, identity/ADST/1D types, WHT lossless, palette, intrabc,
10-bit, 4:4:4 and monochrome through the TPU code path.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.xslow

sys.path.insert(0, str(Path(__file__).parent))

from dav1d_mirror_tpu.host import headers as h  # noqa: E402
from test_e2e_intra import build_stream  # noqa: E402


CASES = [
    dict(w=64, h=64, q=100),
    dict(w=64, h=64, q=20, txsw=True),
    dict(w=72, h=36, q=80, txsw=True),
    dict(w=64, h=64, q=0),                    # lossless / WHT
    dict(w=96, h=64, q=100, bitdepth=10),
    dict(w=64, h=64, q=100, layout=h.PIXEL_LAYOUT_I444),
    dict(w=64, h=64, q=100, mono=1),
    dict(w=128, h=96, q=150, lf=(63, 60, 63, 63, 7), txsw=True),
    dict(w=64, h=64, q=60, fi=1, txsw=True),  # filter intra
]


@pytest.mark.parametrize("ci", range(len(CASES)))
def test_tpu_intra_oracle_exact(ci, oracle_bin, tmp_path):
    import subprocess
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.output import MD5Muxer
    from dav1d_mirror_tpu.host.demux import open_demuxer

    seq, _, ivf = build_stream(CASES[ci], seed=31 + ci)
    p = tmp_path / "t.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "-o", "-"], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    want = r.stdout.strip()

    dec = api.Decoder(api.Settings(use_tpu_inter=True,
                                   use_tpu_intra_engine=True))
    mux = MD5Muxer("-")
    _, units = open_demuxer(ivf)
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    assert mux.digest() == want
