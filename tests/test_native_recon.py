"""The native C++ decode-order reconstruction pass (native/recon.cpp via
host/native_recon.py) is bit-identical to the Python walk
(models/ref_decoder._recon_tile) and actually RUNS (no silent fallback)
on every host-sequential block class: plain intra (all predictors, CFL,
palette), keyframe intrabc, and inter-intra blends over device puts."""
import numpy as np
import pytest

import dav1d_mirror_tpu.api as api
import dav1d_mirror_tpu.host.native_recon as native_recon
from dav1d_mirror_tpu.host.demux import open_demuxer
from dav1d_mirror_tpu.output import MD5Muxer

from test_e2e_intra import build_stream as build_intra
from test_e2e_inter import build_stream as build_inter


def _md5(ivf, tpu):
    _, units = open_demuxer(ivf)
    dec = api.Decoder(api.Settings(use_tpu_inter=tpu, use_tpu_filters=tpu,
                                   apply_grain=False, logger=None))
    mux = MD5Muxer()
    for obus in units:
        dec.send_obus(obus)
        while (pic := dec.get_picture()) is not None:
            mux.write(pic)
    return mux.digest()


@pytest.fixture
def native_spy(monkeypatch):
    calls = {"n": 0, "rc": []}
    orig = native_recon.recon_tile_native

    def spy(*a, **k):
        rc = orig(*a, **k)
        calls["n"] += 1
        calls["rc"].append(rc)
        return rc

    monkeypatch.setattr(native_recon, "recon_tile_native", spy)
    return calls


INTRA_CASES = [
    # keyframe intrabc: whole-pel luma copy + bilinear chroma, 8/10-bit
    dict(w=64, h=64, q=100, scc=1, intrabc=True, txsw=True),
    dict(w=64, h=64, q=100, scc=1, intrabc=True, bitdepth=10, txsw=True),
    dict(w=64, h=64, q=100, scc=1, intrabc=True, layout=3, txsw=True),
]


@pytest.mark.parametrize("ci, cfg", enumerate(INTRA_CASES))
def test_native_pass_intrabc_bit_exact(ci, cfg, native_spy):
    _, _, ivf = build_intra(cfg, seed=20 + ci)
    got = _md5(ivf, tpu=True)
    assert native_spy["n"] > 0 and all(rc == 0 for rc in native_spy["rc"])
    assert got == _md5(ivf, tpu=False)


INTER_CASES = [
    dict(interintra=1, txsw=True),
    dict(comp=True, masked=1, interintra=1, txsw=True),
]


@pytest.mark.parametrize("ci, cfg", enumerate(INTER_CASES))
def test_native_pass_interintra_bit_exact(ci, cfg, native_spy):
    _, ivf, _ = build_inter(cfg, seed=30 + ci)
    got = _md5(ivf, tpu=True)
    assert native_spy["n"] > 0 and all(rc == 0 for rc in native_spy["rc"])
    assert got == _md5(ivf, tpu=False)


def test_native_pass_runs_on_plain_intra(native_spy):
    _, _, ivf = build_intra(dict(w=64, h=64, q=100, fi=1, txsw=True),
                            seed=40)
    got = _md5(ivf, tpu=True)
    assert native_spy["n"] > 0 and all(rc == 0 for rc in native_spy["rc"])
    assert got == _md5(ivf, tpu=False)


def test_python_fallback_when_native_unavailable(monkeypatch, native_spy):
    """With the native walk disabled, the Python pass produces the same
    pixels (the fallback path stays alive and bit-exact)."""
    _, _, ivf = build_intra(dict(w=64, h=64, q=100, scc=1, intrabc=True,
                                 txsw=True), seed=20)
    ref = _md5(ivf, tpu=True)
    monkeypatch.setattr(native_recon, "available", lambda: False)
    assert _md5(ivf, tpu=True) == ref
