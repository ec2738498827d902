"""The fused whole-frame program (models/frame_exec).

The interpreter (eager op replay) is exercised by every device-path test
on CPU; these tests force the JIT-COMPILED whole-frame trace
(DAV1D_TPU_FUSE=1 — the path real TPU decodes take) on the checked-in
smoke streams and require bit-identical md5s vs the reference hashes
(which the oracle produced). Covers: trace/compile of the op
interpreter, the single-descriptor upload, and static-slice plumbing."""
import hashlib
import os

import pytest

STREAMS = os.path.join(os.path.dirname(__file__), "streams")


def _md5s():
    out = {}
    with open(os.path.join(STREAMS, "md5.txt")) as f:
        for line in f:
            digest, name = line.split()
            out[name] = digest
    return out


def _decode_md5(path):
    import dav1d_mirror_tpu.api as api
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.output import MD5Muxer
    with open(path, "rb") as f:
        data = f.read()
    _, units = open_demuxer(data)
    dec = api.Decoder(api.Settings(use_tpu_inter=True,
                                   use_tpu_filters=True, apply_grain=False))
    mux = MD5Muxer()
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    return mux.digest()


@pytest.mark.slow
@pytest.mark.parametrize("name", ["inter_basic", "inter_compound_oh"])
def test_fused_frame_program_bit_exact(name, monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_FUSE", "1")
    got = _decode_md5(os.path.join(STREAMS, f"{name}.ivf"))
    assert got == _md5s()[f"{name}.ivf"]
