"""ProgramSchema: canonicalized fused-program packing.

Two properties: (1) decoding through the schema'd Decoder path stays
bit-exact vs the host reference decode; (2) the per-frame program
signature CONVERGES — after the schema has seen the stream's variety,
successive inter frames produce identical signatures (one compiled XLA
program per stream instead of one multi-minute compile per frame, the
round-2 bench failure).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_inter import build_stream  # noqa: E402

import dav1d_mirror_tpu.api as api  # noqa: E402
from dav1d_mirror_tpu.host.demux import open_demuxer  # noqa: E402
import dav1d_mirror_tpu.models.tpu_inter as ti  # noqa: E402


def _decode(ivf, settings, sig_box=None, dec=None, n_passes=1):
    dec = dec or api.Decoder(settings)
    orig = ti.build_frame_program
    if sig_box is not None:
        def spy(*a, **k):
            built = orig(*a, **k)
            sig = built.prog.finalize()[0]   # pure: safe to call twice
            sig_box.append(sig)
            return built

        ti.build_frame_program = spy
    try:
        _, units = open_demuxer(ivf)
        units = list(units)
        pics = []
        for p in range(n_passes):
            if p:
                dec.flush()      # replay: schema survives flush
                if sig_box is not None:
                    sig_box.append("---flush---")
            for unit in units:
                dec.send_obus(unit)
                while (pic := dec.get_picture()) is not None:
                    pics.append([np.asarray(pl) for pl in pic.planes])
        return pics
    finally:
        if sig_box is not None:
            ti.build_frame_program = orig


@pytest.mark.parametrize("cfg", [
    dict(n_inter=6, txsw=True, comp=True, swmotion=True,
         lf=(20, 20, 14, 14, 1)),
    dict(n_inter=5, warp=True, txsw=True),
])
def test_schema_bitexact_and_convergent(cfg):
    seq, ivf, n_frames = build_stream(cfg, seed=5150)
    want = _decode(ivf, api.Settings(use_tpu_inter=False,
                                     use_tpu_filters=False, logger=None))
    sigs = []
    got = _decode(ivf, api.Settings(use_tpu_inter=True,
                                    use_tpu_filters=False, logger=None),
                  sig_box=sigs, n_passes=2)
    assert len(got) == 2 * len(want) == 2 * n_frames
    for fi, (g, w) in enumerate(zip(got, want + want)):
        for pl, (a, b) in enumerate(zip(g, w)):
            np.testing.assert_array_equal(a, b, err_msg=f"f{fi} pl{pl}")
    # convergence: once the grow-only schema has seen the stream's case
    # variety (pass 1), EVERY frame packs to one identical signature —
    # pass 2 (seek-replay, or any longer stream whose content variety
    # has saturated) runs on ONE compiled program
    cut = sigs.index("---flush---")
    pass2 = sigs[cut + 1:]
    assert len(pass2) == len(sigs[:cut])
    # intra programs (empty plane_shapes, sig[3]) are hres-only and
    # stay outside the schema; every INTER frame must share one program
    p2_inter = [s for s in pass2 if s[3]]
    assert len(p2_inter) >= 3
    assert all(s == p2_inter[0] for s in p2_inter), \
        "saturated-schema inter signatures are not identical"
