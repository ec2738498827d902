"""Decode-frame-type filtering and seek/flush behavior (the analogues of
dav1d's --decodeframetype and tests/seek_stress.c)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import dav1d_mirror_tpu.api as api  # noqa: E402
from dav1d_mirror_tpu.host.demux import open_demuxer  # noqa: E402
from test_e2e_inter import build_stream  # noqa: E402


def _two_gop_stream(seed=21):
    """KEY + 3 inter, then (concatenated) KEY + 3 inter: two GOPs."""
    _, g1, _ = build_stream(dict(txsw=True), seed=seed)
    _, g2, _ = build_stream(dict(comp=True), seed=seed + 50)
    # splice: keep g1 whole; append g2's frames (drop its IVF header)
    hdr_len = 32
    n1 = int.from_bytes(g1[24:28], "little")
    n2 = int.from_bytes(g2[24:28], "little")
    out = bytearray(g1)
    out[24:28] = (n1 + n2).to_bytes(4, "little")
    out += g2[hdr_len:]
    return bytes(out), n1, n2


def _decode_all(ivf, settings=None):
    dec = api.Decoder(settings or api.Settings())
    _, units = open_demuxer(ivf)
    pics = []
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    return pics


def test_decodeframetype_key_matches_oracle(oracle_bin, tmp_path):
    ivf, n1, n2 = _two_gop_stream()
    p = tmp_path / "g.ivf"
    p.write_bytes(ivf)
    r = subprocess.run([oracle_bin, "-i", str(p), "--muxer", "md5",
                        "--decodeframetype", "key", "-o", "-"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    from dav1d_mirror_tpu.output import MD5Muxer
    pics = _decode_all(ivf, api.Settings(
        decode_frame_type=api.DECODEFRAMETYPE_KEY))
    assert len(pics) == 2  # only the two keyframes
    mux = MD5Muxer("-")
    for pic in pics:
        mux.write(pic)
    assert mux.digest() == r.stdout.strip()


def test_decodeframetype_all_vs_key_consistency():
    ivf, n1, n2 = _two_gop_stream(seed=33)
    full = _decode_all(ivf)
    keys = _decode_all(ivf, api.Settings(
        decode_frame_type=api.DECODEFRAMETYPE_KEY))
    key_frames = [p for p in full if p.frame_hdr.frame_type == 0]
    assert len(keys) == len(key_frames)
    for a, b in zip(keys, key_frames):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(pa, pb)


def test_seek_flush_restart_at_keyframe():
    """seek_stress analogue: flush mid-stream, resume at the second GOP's
    keyframe; outputs must equal the tail of a full decode."""
    ivf, n1, n2 = _two_gop_stream(seed=44)
    full = _decode_all(ivf)
    assert len(full) == n1 + n2

    dec = api.Decoder(api.Settings())
    _, units = open_demuxer(ivf)
    units = list(units)
    # decode the first 2 TUs, then seek: flush and jump to the 2nd GOP
    for obus in units[:2]:
        dec.send_obus(obus)
        while dec.get_picture() is not None:
            pass
    dec.flush()
    tail = []
    for obus in units[n1:]:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            tail.append(pic)
    assert len(tail) == n2
    for a, b in zip(tail, full[n1:]):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(pa, pb)


def test_pipelined_decode_matches_sync():
    """Frame pipelining (host-entropy(N+1) || pixels(N)) is bit-exact
    and preserves output order/count (dav1d frame threading analogue)."""
    import numpy as np
    from dav1d_mirror_tpu.api import Decoder, Settings
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.output import MD5Muxer
    from pathlib import Path
    ivf = (Path(__file__).parent / "streams" / "inter_basic.ivf"
           ).read_bytes()

    def run(**kw):
        d = Decoder(Settings(logger=None, **kw))
        mux = MD5Muxer()
        _, units = open_demuxer(ivf)
        n = 0
        for u in units:
            d.send_obus(u)
            while (p := d.get_picture()) is not None:
                mux.write(p)
                n += 1
        d.drain()
        while (p := d.get_picture()) is not None:
            mux.write(p)
            n += 1
        d.close()
        return mux.digest(), n

    m0, n0 = run()
    m1, n1 = run(max_frame_delay=3)
    m2, n2 = run(n_threads=4)
    assert (m0, n0) == (m1, n1) == (m2, n2)


@pytest.mark.xslow
def test_pipelined_device_path_matches_sync():
    """Stage-split pipelining on the DEVICE path (deferred filter-plane
    downloads on the gather stage) is bit-exact with the synchronous
    device decode — covers api._gather_planes/_wait_host_planes.

    Slow tier: the first device-path decode in a process jits ~360
    bucket kernels on the CPU backend (~4 min); the path itself is also
    validated on real hardware by tools_dev/profile_e2e --threads 2."""
    from dav1d_mirror_tpu.api import Decoder, Settings
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.output import MD5Muxer
    from pathlib import Path
    ivf = (Path(__file__).parent / "streams" / "inter_basic.ivf"
           ).read_bytes()

    def run(**kw):
        d = Decoder(Settings(logger=None, use_tpu_inter=True,
                             use_tpu_filters=True, **kw))
        mux = MD5Muxer()
        _, units = open_demuxer(ivf)
        n = 0
        for u in units:
            d.send_obus(u)
            while (p := d.get_picture()) is not None:
                mux.write(p)
                n += 1
        d.drain()
        while (p := d.get_picture()) is not None:
            mux.write(p)
            n += 1
        d.close()
        return mux.digest(), n

    m0, n0 = run()
    m1, n1 = run(n_threads=4)
    assert (m0, n0) == (m1, n1)
