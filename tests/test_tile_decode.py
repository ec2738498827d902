"""Sharded decode of real multi-tile streams over the 8-virtual-device
mesh (parallel/tile_decode): tile rows shard the wavefront recon
(shard_map, no collectives — tiles are independent), then the banded
deblock/CDEF passes exchange ppermute halos. Bit-exact vs the
single-device decode (itself oracle-verified)."""
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

sys.path.insert(0, str(Path(__file__).parent))

pytestmark = pytest.mark.xslow

from dav1d_mirror_tpu.host import headers as h  # noqa: E402
from dav1d_mirror_tpu.testing.streamgen import (  # noqa: E402
    RandomPolicy, make_seq_hdr, make_key_frame_hdr, gen_frame_tiles,
    gen_ivf)
from dav1d_mirror_tpu.data.tables import (  # noqa: E402
    new_cdf_context, qcat_from_qidx)
from dav1d_mirror_tpu.models import ref_decoder as rd  # noqa: E402
from dav1d_mirror_tpu.parallel.tile_decode import (  # noqa: E402
    sharded_intra_decode)
from dav1d_mirror_tpu.host.demux import parse_ivf  # noqa: E402
from dav1d_mirror_tpu.host.ivf import split_obus  # noqa: E402
import dav1d_mirror_tpu.api as api  # noqa: E402


CASES = [
    dict(W=128, H=512, lf=(28, 28, 20, 20, 1)),
    dict(W=64, H=512, lf=(24, 24, 16, 16, 1),
         cdefp=dict(damping=4, n_bits=1, y_strength=[6, 11],
                    uv_strength=[3, 0])),
    dict(W=192, H=512, lf=(35, 30, 25, 20, 2), q=60),
]


@pytest.mark.parametrize("ci", range(len(CASES)))
def test_sharded_tile_decode_bit_exact(ci):
    cfg = CASES[ci]
    W, H = cfg["W"], cfg["H"]
    q = cfg.get("q", 100)
    cdefp = cfg.get("cdefp")
    seq = make_seq_hdr(W, H, cdef=1 if cdefp else 0)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                            loopfilter=cfg["lf"], tiles=(0, 3),
                            cdef_params=cdefp)
    cdf0 = new_cdf_context(qcat_from_qidx(q))
    tiles_p, _ = gen_frame_tiles(seq, kf, RandomPolicy(9 + ci), cdf=cdf0)
    ivf = gen_ivf(seq, [(kf, tiles_p, None)])
    _, _, _, frames = parse_ivf(ivf)
    box = {}
    orig = rd.recon_frame

    def spy(s_, f_, coders, bufs, *a, **k):
        box.update(coders=coders, seq=s_, fhdr=f_)
        return orig(s_, f_, coders, bufs, *a, **k)

    rd.recon_frame = spy
    try:
        d = api.Decoder(api.Settings(logger=None))
        for fr in frames:
            d.send_obus([o for _, o in split_obus(fr.data)])
        d.get_picture()
    finally:
        rd.recon_frame = orig
    coders, seq_, fhdr_ = box["coders"], box["seq"], box["fhdr"]

    bufs_ref = rd.FrameBuffers(seq_, fhdr_)
    rd.recon_frame(seq_, fhdr_, coders, bufs_ref)
    bufs_ref = rd.apply_inloop_filters(seq_, fhdr_, coders, bufs_ref)

    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    bufs = rd.FrameBuffers(seq_, fhdr_)
    sharded_intra_decode(seq_, fhdr_, coders, mesh, bufs)

    for i, (a, b) in enumerate(zip(bufs.planes, bufs_ref.planes)):
        ssh = bufs.ss_hor if i else 0
        ssv = bufs.ss_ver if i else 0
        w_v = (bufs.width + ssh) >> ssh
        h_v = (bufs.height + ssv) >> ssv
        assert np.array_equal(a[:h_v, :w_v], b[:h_v, :w_v]), \
            f"plane {i} differs"


class _InterOnlyPolicy(RandomPolicy):
    """Every block inter (translational single-ref when the headers
    disable compound/OBMC/warp) — the scope of sharded_inter_decode."""

    def __call__(self, key, maxv):
        if key == "is_inter":
            return 1
        return super().__call__(key, maxv)


INTER_CASES = [
    dict(W=128, H=512, lf=(24, 24, 16, 16, 1)),
    dict(W=64, H=512, lf=(20, 20, 14, 14, 1), q=80,
         cdefp=dict(damping=4, n_bits=1, y_strength=[6, 11],
                    uv_strength=[3, 0])),
    # BASELINE config-4 grid shape: 2x2 tiles on a 4-device mesh, with
    # compound (avg) blocks enabled — exercises tile-COLUMN sharding
    # and the compound join in sharded_inter_decode
    dict(W=128, H=128, lf=(24, 24, 16, 16, 1), tiles=(1, 1), mesh_n=4,
         comp=True),
    dict(W=256, H=128, lf=(20, 20, 14, 14, 1), q=80, tiles=(2, 1),
         mesh_n=8, comp=True,
         cdefp=dict(damping=4, n_bits=1, y_strength=[6, 11],
                    uv_strength=[3, 0])),
]


@pytest.mark.parametrize("ci", range(len(INTER_CASES)))
def test_sharded_inter_decode_bit_exact(ci):
    """BASELINE config-4's inter leg: a KEY + 2-INTER multi-tile-row
    chain decoded with tile rows sharded over the 8-device mesh, refs
    replicated per shard, banded filter halos — bit-exact vs the
    single-device decode."""
    from dav1d_mirror_tpu.testing.streamgen import (make_inter_frame_hdr,
                                                    gen_frame_tiles)
    from dav1d_mirror_tpu.parallel.tile_decode import sharded_inter_decode
    from dav1d_mirror_tpu.data.tables import cdf_thread_update

    cfg = INTER_CASES[ci]
    W, H = cfg["W"], cfg["H"]
    q = cfg.get("q", 100)
    cdefp = cfg.get("cdefp")
    lf = cfg["lf"]
    tiles = cfg.get("tiles", (0, 3))
    mesh_n = cfg.get("mesh_n", 8)
    comp = cfg.get("comp", False)
    seq = make_seq_hdr(W, H, cdef=1 if cdefp else 0)
    kf = make_key_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                            loopfilter=lf, tiles=tiles,
                            cdef_params=cdefp)
    cdf0 = new_cdf_context(qcat_from_qidx(q))
    kf_tiles, kf_coders = gen_frame_tiles(seq, kf,
                                          _InterOnlyPolicy(40 + ci),
                                          cdf=cdf0.copy())
    chain = [(kf, kf_coders)]
    cdf = cdf_thread_update(cdf0, kf_coders[kf.tiling.update].cdf, True)
    for i in range(2):
        fi = make_inter_frame_hdr(seq, qidx=q, txfm_mode=h.TX_SWITCHABLE,
                                  loopfilter=lf, cdef_params=cdefp,
                                  tiles=tiles, switchable_comp=comp)
        _, coders = gen_frame_tiles(seq, fi,
                                    _InterOnlyPolicy(50 + 7 * i + ci),
                                    cdf=cdf.copy(), ref_poc=[0] * 7)
        chain.append((fi, coders))
        cdf = cdf_thread_update(cdf, coders[fi.tiling.update].cdf, False)

    assert len(jax.devices()) >= mesh_n
    mesh = Mesh(np.array(jax.devices()[:mesh_n]), ("tile",))

    refs_ref = [None] * 8
    refs_mesh = [None] * 8
    for fidx, (fhdr, coders) in enumerate(chain):
        keyframe = fhdr.frame_type in (0, 2)
        bufs_ref = rd.FrameBuffers(seq, fhdr)
        rd.recon_frame(seq, fhdr, coders, bufs_ref, list(refs_ref))
        bufs_ref = rd.apply_inloop_filters(seq, fhdr, coders, bufs_ref)

        bufs = rd.FrameBuffers(seq, fhdr)
        if keyframe:
            sharded_intra_decode(seq, fhdr, coders, mesh, bufs)
        else:
            sharded_inter_decode(seq, fhdr, coders, mesh, bufs,
                                 list(refs_mesh))

        for i, (a, b) in enumerate(zip(bufs.planes, bufs_ref.planes)):
            ssh = bufs.ss_hor if i else 0
            ssv = bufs.ss_ver if i else 0
            w_v = (bufs.width + ssh) >> ssh
            h_v = (bufs.height + ssv) >> ssv
            assert np.array_equal(a[:h_v, :w_v], b[:h_v, :w_v]), \
                f"frame {fidx} plane {i} differs"
        for s in range(8):
            if (fhdr.refresh_frame_flags >> s) & 1:
                refs_ref[s] = bufs_ref
                refs_mesh[s] = bufs
