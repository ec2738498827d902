"""Row-band-sharded deblocking over the 8-device mesh vs the
single-device kernel, bit-exact (real ppermute halo exchange)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from dav1d_mirror_tpu.host import headers as h
from dav1d_mirror_tpu.host.lf import build_lf_arrays
from dav1d_mirror_tpu.ops.ref.loopfilter import calc_eih
from dav1d_mirror_tpu.ops.loopfilter_tpu import deblock_plane_tpu
from dav1d_mirror_tpu.parallel.filter_shard import band_deblock_plane
from dav1d_mirror_tpu.models.ref_decoder import (FrameBuffers,
                                                 recon_intra_frame)
from dav1d_mirror_tpu.testing.streamgen import (RandomPolicy, make_seq_hdr,
                                                make_key_frame_hdr,
                                                gen_intra_frame)

CONFIGS = [
    dict(w=128, h=96, q=120, lf=(32, 28, 24, 20, 0)),
    dict(w=64, h=64, q=60, lf=(63, 63, 63, 63, 7), txsw=True),
    dict(w=96, h=64, q=100, lf=(20, 25, 15, 10, 3), bitdepth=10),
    dict(w=128, h=128, q=100, lf=(40, 40, 30, 30, 1), sb128=1),
]


def _prep(lvl, cv, ch):
    lv = lvl[:, :, cv].astype(np.int32)
    lvp = np.zeros_like(lv)
    lvp[:, 1:] = lv[:, :-1]
    lh = lvl[:, :, ch].astype(np.int32)
    lhp = np.zeros_like(lh)
    lhp[1:] = lh[:-1]
    return lv, lvp, lh, lhp


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_band_sharded_deblock_matches_single_device(ci):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("band",))

    cfg = CONFIGS[ci]
    seq = make_seq_hdr(cfg["w"], cfg["h"], bitdepth=cfg.get("bitdepth", 8),
                       sb128=cfg.get("sb128", 0))
    fhdr = make_key_frame_hdr(
        seq, qidx=cfg["q"],
        txfm_mode=h.TX_SWITCHABLE if cfg.get("txsw") else h.TX_LARGEST,
        loopfilter=cfg["lf"])
    tile, coder = gen_intra_frame(seq, fhdr, RandomPolicy(77 + ci))
    bufs = FrameBuffers(seq, fhdr)
    recon_intra_frame(seq, fhdr, [coder], bufs)

    lf = build_lf_arrays(seq, fhdr, [coder], bufs.width, bufs.height)
    e_lut, i_lut = calc_eih(fhdr.loopfilter_sharpness)
    e_lut, i_lut = np.asarray(e_lut), np.asarray(i_lut)
    bd = seq.bitdepth

    plane_specs = [(0, lf.edge_v_y, lf.edge_h_y, lf.lvl_y, 0, 1, True)]
    for pl in (0, 1):
        plane_specs.append((1 + pl, lf.edge_v_uv, lf.edge_h_uv,
                            lf.lvl_uv, pl, pl, False))
    for pli, ev, eh, lvl, cv, chh, luma in plane_specs:
        lv, lvp, lh_, lhp = _prep(lvl, cv, chh)
        single = np.asarray(deblock_plane_tpu(
            bufs.planes[pli].astype(np.int32), ev.astype(np.int32),
            eh.astype(np.int32), lv, lvp, lh_, lhp, e_lut, i_lut,
            luma=luma, bitdepth=bd))
        banded = band_deblock_plane(
            mesh, bufs.planes[pli].astype(np.int32), ev, eh, lv, lvp,
            lh_, lhp, e_lut, i_lut, luma, bd)
        np.testing.assert_array_equal(banded, single,
                                      err_msg=f"cfg{ci} plane{pli}")


@pytest.mark.parametrize("cfg", [
    dict(H=96, W=128, bw=8, bh=8, bd=8),
    dict(H=64, W=64, bw=4, bh=4, bd=10),    # chroma-like 4:2:0 blocks
    dict(H=80, W=96, bw=4, bh=8, bd=8),     # 4:2:2-like
])
def test_band_sharded_cdef_matches_single_device(cfg):
    from dav1d_mirror_tpu.ops.cdef_tpu import cdef_filter_plane_tpu
    from dav1d_mirror_tpu.parallel.filter_shard import band_cdef_plane

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("band",))

    H, W, bw, bh, bd = (cfg[k] for k in ("H", "W", "bw", "bh", "bd"))
    hb, wb = H // bh, W // bw
    rng = np.random.default_rng(5)
    plane = rng.integers(0, (1 << bd) - 1, (H, W)).astype(np.int32)
    dirm = rng.integers(0, 8, (hb, wb)).astype(np.int32)
    pri = (rng.integers(0, 16, (hb, wb)) << (bd - 8)).astype(np.int32)
    sec = (rng.integers(0, 4, (hb, wb)) << (bd - 8)).astype(np.int32)
    act = rng.random((hb, wb)) < 0.8
    damping = 5 + (bd - 8)

    import jax.numpy as jnp
    single = np.asarray(cdef_filter_plane_tpu(
        jnp.asarray(plane), jnp.asarray(plane), jnp.asarray(dirm),
        jnp.asarray(pri), jnp.asarray(sec), damping, jnp.asarray(act),
        bd, bw, bh))
    banded = band_cdef_plane(mesh, plane, dirm, pri, sec, damping, act,
                             bd, bw, bh)
    np.testing.assert_array_equal(banded, single)


def test_sharded_lr_matches_single_device():
    from dav1d_mirror_tpu.ops.looprestoration_tpu import wiener_batch_tpu
    from dav1d_mirror_tpu.parallel.filter_shard import shard_lr_batch
    import jax.numpy as jnp

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("band",))

    rng = np.random.default_rng(9)
    B, unit = 37, 64          # deliberately not divisible by 8
    padded = rng.integers(0, 255, (B, 70, unit + 6)).astype(np.int32)
    f3 = rng.integers(-5, 6, (B, 3))
    fh = np.zeros((B, 7), np.int32)
    fh[:, :3] = f3
    fh[:, 4:] = f3[:, ::-1]
    fh[:, 3] = 128 - 2 * f3.sum(1)
    single = np.asarray(wiener_batch_tpu(
        jnp.asarray(padded), jnp.asarray(fh), jnp.asarray(fh), unit, 64,
        8))
    banded = shard_lr_batch(mesh, padded, fh, fh, unit, 64, 8)
    np.testing.assert_array_equal(banded, single)
