"""Error containment + fuzz robustness (SURVEY §5.3: errors poison
forward, never crash; flush/keyframe recovers) and logger/event flags."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import dav1d_mirror_tpu.api as api  # noqa: E402
from dav1d_mirror_tpu.host.demux import open_demuxer  # noqa: E402
from test_e2e_inter import build_stream  # noqa: E402


def _units(ivf):
    _, units = open_demuxer(ivf)
    return list(units)


def test_corrupt_tile_contained_and_recovers():
    _, ivf, _ = build_stream(dict(txsw=True), seed=71)
    units = _units(ivf)
    logs = []
    dec = api.Decoder(api.Settings(logger=logs.append))

    # frame 0 (keyframe) with corrupted tile payload
    bad = [bytes(o) for o in units[0]]
    bad[-1] = bad[-1][:len(bad[-1]) // 2] + \
        bytes(255 - b for b in bad[-1][len(bad[-1]) // 2:])
    errors = 0
    try:
        dec.send_obus(bad)
    except api.DecodeError:
        errors += 1
    # the decoder object must remain usable; feed the clean stream
    pics = []
    for obus in units:
        try:
            dec.send_obus(obus)
        except api.DecodeError:
            errors += 1
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    assert len(pics) >= 1          # clean keyframe decodes after error
    if errors:
        assert dec.last_error is not None
        assert logs                 # logger saw the containment


def test_truncated_obus_fuzz_no_crash():
    """Truncations and byte flips must raise DecodeError, never crash."""
    _, ivf, _ = build_stream(dict(comp=True), seed=72)
    units = _units(ivf)
    rng = np.random.default_rng(0)
    for trial in range(40):
        dec = api.Decoder(api.Settings(logger=None))
        for obus in units:
            mut = []
            for o in obus:
                o = bytearray(o)
                if len(o) and rng.random() < 0.5:
                    if rng.random() < 0.5 and len(o) > 2:
                        o = o[:rng.integers(1, len(o))]   # truncate
                    else:
                        o[rng.integers(0, len(o))] ^= \
                            1 << rng.integers(0, 8)       # bit flip
                mut.append(bytes(o))
            try:
                dec.send_obus(mut)
                while dec.get_picture() is not None:
                    pass
            except api.DecodeError:
                pass  # contained


def test_strict_mode_poisons_dependents():
    _, ivf, _ = build_stream(dict(txsw=True), seed=73)
    units = _units(ivf)
    dec = api.Decoder(api.Settings(strict_std_compliance=True,
                                   logger=None))
    # corrupt the keyframe -> its refresh slots are poisoned
    bad = [bytes(o) for o in units[0]]
    bad[-1] = bad[-1][:8]
    with pytest.raises(api.DecodeError):
        dec.send_obus(bad)
    # the following inter frame references poisoned slots -> error too
    with pytest.raises(api.DecodeError):
        dec.send_obus(units[1])
    # flush is the elastic reset; then a clean keyframe decodes
    dec.flush()
    dec.send_obus(units[0])
    assert dec.get_picture() is not None


def test_event_flags_new_sequence():
    _, ivf, _ = build_stream(dict(), seed=74)
    units = _units(ivf)
    dec = api.Decoder(api.Settings(logger=None))
    dec.send_obus(units[0])
    f = dec.get_event_flags()
    assert f & api.EVENT_FLAG_NEW_SEQUENCE
    assert dec.get_event_flags() == 0      # cleared on read
    dec.send_obus(units[1])
    assert dec.get_event_flags() == 0      # no new sequence header


def test_trace_scopes_accumulate():
    from dav1d_mirror_tpu.utils import trace
    _, ivf, _ = build_stream(dict(), seed=75)
    trace.enabled = True
    trace.reset()
    try:
        dec = api.Decoder(api.Settings(logger=None))
        for obus in _units(ivf):
            dec.send_obus(obus)
            while dec.get_picture() is not None:
                pass
        st = trace.stats()
        assert "host-entropy" in st and st["host-entropy"][1] >= 1
        assert "reconstruction" in st
        assert "ms/call" in trace.report()
    finally:
        trace.enabled = False
        trace.reset()
