"""Large-geometry end-to-end bit-exactness (VERDICT r1: e2e only ever
covered tiny frames).  Decodes generated 1080p streams — multi-
superblock-row filters, LR unit lookup at frame edges, 64x64 tx at
boundaries all in play — and compares the output md5 against the oracle
decoder built from the reference."""
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))

from conftest import ORACLE  # noqa: E402
from test_e2e_inter import build_stream  # noqa: E402

pytestmark = pytest.mark.xslow


CFGS = {
    "1080p_inter_cdef_txsw": dict(
        w=1920, h=1080, n_inter=1, q=80, txsw=True,
        lf=(20, 20, 16, 12, 1),
        cdef=dict(damping=4, n_bits=1, y_strength=[6, 11],
                  uv_strength=[3, 0])),
    "1080p_10bit_lr": dict(
        w=1920, h=1080, n_inter=1, q=80, bitdepth=10,
        lf=(16, 16, 10, 8, 1), lr=(2, 2, 2)),
}


def _oracle_md5(ivf, tmp_path):
    p = tmp_path / "s.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([ORACLE, "-i", str(p), "--muxer", "md5", "-o",
                        "-", "-q"], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().split()[0]


@pytest.mark.parametrize("name", sorted(CFGS))
def test_1080p_bit_exact_vs_oracle(name, tmp_path, oracle_bin):
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.output import MD5Muxer

    _, ivf, _ = build_stream(CFGS[name], seed=11)
    want = _oracle_md5(ivf, tmp_path)

    # host path and device path must BOTH match the oracle
    for tpu in (False, True):
        dec = api.Decoder(api.Settings(use_tpu_inter=tpu,
                                       use_tpu_filters=tpu))
        mux = MD5Muxer()
        _, units = open_demuxer(ivf)
        for obus in units:
            dec.send_obus(obus)
            while (pic := dec.get_picture()) is not None:
                mux.write(pic)
        assert mux.digest() == want, f"tpu={tpu} md5 mismatch ({name})"
