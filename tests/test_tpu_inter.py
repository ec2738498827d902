"""Device (JAX) inter reconstruction vs the NumPy reference pipeline,
bit-exact. Covers the batched MC unit path (single-ref + compound
weighted join), device residual transforms with scatter-add, and the mixed
host-fallback ordering (warp/OBMC/masked-compound/inter-intra blocks and
intra blocks interleaved with device-covered blocks)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.models.ref_decoder import decode_ivf
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                make_inter_frame_hdr,
                                                gen_intra_frame,
                                                gen_inter_frame, gen_ivf)

CASES = [
    ("basic", 9001, dict()),
    ("swfilter", 9002, dict(swfilter=True)),
    ("compound", 9003, dict(comp=True)),
    ("deblock", 9004, dict(lf=(28, 28, 20, 20, 1))),
    ("big", 9005, dict(w=128, hh=96, comp=True, swfilter=True)),
    ("warp-mix", 9101, dict(warp=True)),
    ("obmc-mix", 9102, dict(swmotion=True)),
    ("wedge-mix", 9103, dict(comp=True, masked=1)),
    ("interintra-mix", 9104, dict(interintra=1)),
    ("10bit", 9105, dict(bitdepth=10, comp=True)),
    ("444", 9106, dict(layout=h.PIXEL_LAYOUT_I444)),
    ("full-device-pipe", 9107, dict(lf=(28, 28, 20, 20, 1),
                                    tpu_filters=True, comp=True)),
]


def _run(tag, seed, w=64, hh=64, q=100, n_inter=2, comp=False,
         swfilter=False, lf=(0, 0, 0, 0, 0), bitdepth=8,
         layout=h.PIXEL_LAYOUT_I420, warp=False, swmotion=False, masked=0,
         interintra=0, tpu_filters=False):
    seq = make_seq_hdr(w, hh, bitdepth=bitdepth, layout=layout,
                       warped_motion=1 if warp else 0,
                       masked_compound=masked, inter_intra=interintra)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                            loopfilter=lf)
    frames = [(kf, gen_intra_frame(seq, kf, RandomPolicy(seed))[0])]
    for i in range(n_inter):
        fi = make_inter_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                                  loopfilter=lf, switchable_comp=comp,
                                  switchable_filter=swfilter, warp=warp,
                                  switchable_motion=swmotion)
        frames.append((fi, gen_inter_frame(seq, fi,
                                           RandomPolicy(seed + 1 + i))[0]))
    ivf = gen_ivf(seq, frames)
    ref = decode_ivf(ivf)
    got = decode_ivf(ivf, use_tpu_inter=True, use_tpu_filters=tpu_filters)
    for fi_, (gp, rp) in enumerate(zip(got, ref)):
        for pl, (g, r) in enumerate(zip(gp, rp)):
            if not np.array_equal(g, r):
                bad = np.argwhere(g.astype(int) != r.astype(int))
                raise AssertionError(
                    f"{tag}: frame{fi_} plane{pl}: {len(bad)} mismatches")


@pytest.mark.parametrize("ci", range(len(CASES)))
def test_tpu_inter_bit_exact(ci):
    tag, seed, kw = CASES[ci]
    _run(tag, seed, **kw)
