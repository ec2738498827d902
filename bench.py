#!/usr/bin/env python
"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Benchmark: the full device pixel pipeline on a synthetic 1080p 4:2:0 frame —
inverse-transform reconstruction (16x16 blocks over all planes), vectorized
deblocking (3 planes), CDEF (direction search on the MXU + filter), and
wiener loop restoration over all 64-row stripes — measured as megapixels of
finished video per second.

vs_baseline is the ratio against dav1d (the reference, built from
/root/reference, single thread) decoding a real generated AV1 stream with
the same filter stages enabled, normalized to Mpix/s. Same pixel work per
area; content differs (synthetic coefficients vs a real stream) — recorded
in `detail`.
"""
from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time

import numpy as np

ORACLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "oracle", "build", "dav1d")


def bench_device_pipeline():
    import jax
    import jax.numpy as jnp
    from dav1d_mirror_tpu.models.recon_step import recon_step
    from dav1d_mirror_tpu.ops.loopfilter_tpu import deblock_plane_tpu
    from dav1d_mirror_tpu.ops.cdef_tpu import cdef_frame_tpu
    from dav1d_mirror_tpu.ops.looprestoration_tpu import wiener_batch_tpu

    W, H = 1920, 1088
    CW, CH = W // 2, H // 2
    rng = np.random.default_rng(0)

    # --- itx recon: a 1080p 4:2:0 frame worth of 16x16 tx blocks
    n_blocks = int(W * H * 1.5) // 256
    coefs = jnp.asarray(rng.integers(-2047, 2048, (n_blocks, 16, 16)),
                        jnp.int32)
    pred = jnp.asarray(rng.integers(0, 256, (n_blocks, 16, 16)), jnp.int32)
    recon = jax.jit(lambda p, c: recon_step(p, c, bitdepth=8))

    # --- deblock: dense edge/level maps (every 4px edge active, mixed
    # widths) — worst-case realistic filtering load
    def dmaps(w, h, nw):
        h4, w4 = h // 4, w // 4
        ev = rng.integers(0, nw, (h4, w4)).astype(np.int32)
        eh = rng.integers(0, nw, (h4, w4)).astype(np.int32)
        lv = rng.integers(1, 64, (h4, w4)).astype(np.int32)
        return ev, eh, lv, lv.copy(), lv.copy(), lv.copy()

    y_plane = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    u_plane = jnp.asarray(rng.integers(0, 256, (CH, CW)), jnp.int32)
    v_plane = jnp.asarray(rng.integers(0, 256, (CH, CW)), jnp.int32)
    e_lut = np.zeros(64, np.int32)
    i_lut = np.zeros(64, np.int32)
    for i in range(64):
        e_lut[i] = 2 + 2 * (i >> 4) + (i & 15)
        i_lut[i] = max(1, i >> 4)
    ym = dmaps(W, H, 3)
    cm = dmaps(CW, CH, 2)

    def deblock_all(y, u, v):
        y = deblock_plane_tpu(y, *ym, e_lut, i_lut, luma=True, bitdepth=8,
                              sb_step4=16)
        u = deblock_plane_tpu(u, *cm, e_lut, i_lut, luma=False, bitdepth=8,
                              sb_step4=8)
        v = deblock_plane_tpu(v, *cm, e_lut, i_lut, luma=False, bitdepth=8,
                              sb_step4=8)
        return y, u, v

    # --- cdef: all 64x64 blocks active, mixed strengths
    n64y, n64x = H // 64, W // 64
    idx_map = rng.integers(0, 4, (n64y, n64x)).astype(np.int32)
    noskip = np.ones((H // 4, W // 4), bool)
    ys = np.asarray([9, 21, 44, 63, 0, 0, 0, 0], np.int32)
    uvs = np.asarray([5, 12, 24, 33, 0, 0, 0, 0], np.int32)

    def cdef_all(y, u, v):
        return cdef_frame_tpu((y, u, v), idx_map, noskip, ys, uvs,
                              5, 8, 1, 1, False)

    # --- wiener LR: all stripes of all planes (17 luma stripes x 30 units
    # + chroma), as the batched kernel sees them
    def lr_batches(w, h, unit):
        n_stripes = (h + 63) // 64
        n_units = w // unit
        B = n_stripes * n_units
        padded = jnp.asarray(rng.integers(0, 256, (B, 64 + 6, unit + 6)),
                             jnp.int32)
        f = rng.integers(-5, 6, (B, 3)).astype(np.int32)
        fh = np.zeros((B, 7), np.int32)
        fh[:, :3] = f
        fh[:, 4:] = f[:, ::-1]
        fh[:, 3] = 128 - 2 * f.sum(axis=1)
        return padded, jnp.asarray(fh), unit, 64

    lry = lr_batches(W, H, 64)
    lru = lr_batches(CW, CH, 32)

    def lr_all():
        a = wiener_batch_tpu(lry[0], lry[1], lry[1], lry[2], lry[3], 8)
        b = wiener_batch_tpu(lru[0], lru[1], lru[1], lru[2], lru[3], 8)
        c = wiener_batch_tpu(lru[0], lru[1], lru[1], lru[2], lru[3], 8)
        return a, b, c

    # --- inter prediction: a 1080p frame worth of 8x8 MC units with
    # two-pass 8-tap filtering (worst case), 7 stacked reference planes
    from dav1d_mirror_tpu.ops.mc_tpu import mc_unit_batch
    ref_y = jnp.asarray(rng.integers(0, 256, (7, H, W)), jnp.int32)
    ref_c = jnp.asarray(rng.integers(0, 256, (7, CH, CW)), jnp.int32)

    def mc_units(n, h, w):
        return (jnp.asarray(rng.integers(0, 7, n), jnp.int32),
                jnp.asarray(rng.integers(-3, h - 16, n), jnp.int32),
                jnp.asarray(rng.integers(-3, w - 16, n), jnp.int32),
                jnp.asarray(rng.integers(1, 16, n), jnp.int32),
                jnp.asarray(rng.integers(1, 16, n), jnp.int32),
                jnp.asarray(rng.integers(0, 9, n), jnp.int32))

    # production two-stage path: full-plane H filtering per (ref,
    # filter_row, mx) combo, then the Pallas DMA vertical pass (falls
    # back to the XLA gather kernel off-TPU)
    from dav1d_mirror_tpu.ops.mc_tpu import (mc_hplanes, mc_unit_batch_hv,
                                             mc_hv_combos, _HPAD_L,
                                             _SUBPEL)
    from dav1d_mirror_tpu.ops import mc_pallas

    use_pallas = mc_pallas.pallas_available()

    def mc_prep(n, h, w):
        arr = np.stack([rng.integers(0, 7, n),
                        rng.integers(-3, h - 16, n),
                        rng.integers(-3, w - 16, n),
                        rng.integers(1, 16, n),
                        rng.integers(1, 16, n),
                        rng.integers(0, 9, n)], 1).astype(np.int32)
        combos, slot, tv = mc_hv_combos(arr, 8)
        if use_pallas:
            padn = (-n) % mc_pallas.CHUNK
            if padn:
                arr = np.concatenate([arr, np.repeat(arr[-1:], padn, 0)])
                slot = np.concatenate([slot, np.repeat(slot[-1:], padn)])
                tv = np.concatenate([tv, np.repeat(tv[-1:], padn)])
            oy_p = np.clip(arr[:, 1], -mc_pallas.PAD_T, h - 1) + \
                mc_pallas.PAD_T
            oxh = np.clip(arr[:, 2], -15, w - 1) + 15
            fv = _SUBPEL[tv, arr[:, 4] - 1].astype(np.int32)
            fvl = np.repeat(fv[:, :, None], 8, 2).transpose(1, 0, 2)
            return (jnp.asarray(combos), jnp.asarray(slot),
                    jnp.asarray((oy_p & ~7).astype(np.int32)),
                    jnp.asarray((oy_p & 7).astype(np.int32)),
                    jnp.asarray((oxh & ~127).astype(np.int32)),
                    jnp.asarray((oxh & 127).astype(np.int32)),
                    jnp.asarray(fvl.reshape(8, -1)))
        ox = np.clip(arr[:, 2], -_HPAD_L, w - 1).astype(np.int32)
        return (jnp.asarray(combos), jnp.asarray(slot),
                jnp.asarray(arr[:, 1]), jnp.asarray(ox),
                jnp.asarray(arr[:, 4]), jnp.asarray(tv))

    mc_y = mc_prep(W * H // 64, H, W)
    mc_c = mc_prep(CW * CH // 64, CH, CW)
    if use_pallas:
        # remap slots to the per-ref padded H-plane layout
        def _remap(d):
            _, remap = mc_pallas.mc_hplanes_pallas(
                jnp.zeros((7, 16, 144), jnp.int32), np.asarray(d[0]), 8)
            return (d[0], jnp.asarray(remap[np.asarray(d[1])])) + d[2:]
        mc_y = _remap(mc_y)
        mc_c = _remap(mc_c)

    mc_y_combos = np.asarray(mc_y[0])
    mc_c_combos = np.asarray(mc_c[0])

    remaps = {}

    def hplanes(refs, combos_np, combos_j):
        if use_pallas:
            hs, remap = mc_pallas.mc_hplanes_pallas(refs, combos_np, 8)
            remaps[id(combos_np)] = remap
            return hs
        return mc_hplanes(refs, combos_j, 8)

    def mc_all():
        hy = hplanes(ref_y, mc_y_combos, mc_y[0])
        hc = hplanes(ref_c, mc_c_combos, mc_c[0])
        if use_pallas:
            run = mc_pallas._make_vpass(8, 8, 8, False)
            hpy = mc_pallas.pad_hstack(hy)[0]
            hpc = mc_pallas.pad_hstack(hc)[0]
            y = run(hpy, *mc_y[1:])
            u = run(hpc, *mc_c[1:])
            v = run(hpc, *mc_c[1:])
        else:
            y = mc_unit_batch_hv((hy,) + mc_y[1:], 8, 8, 8, False)
            u = mc_unit_batch_hv((hc,) + mc_c[1:], 8, 8, 8, False)
            v = mc_unit_batch_hv((hc,) + mc_c[1:], 8, 8, 8, False)
        return y, u, v

    # ONE compiled program for the whole frame step. Measurement
    # protocol: frames are CHAINED through a data dependency (the
    # deblock input depends on the previous frame's outputs) and the
    # wall clock covers one host fetch at the end; the fixed dispatch/
    # fetch round-trip is measured separately and subtracted. On the
    # tunneled axon platform jax.block_until_ready returns before
    # execution finishes, so a host fetch is the only true sync.
    @jax.jit
    def frame_step(pred, coefs, y0, u0, v0):
        m = mc_all()
        r = recon(pred, coefs)
        y, u, v = deblock_all(y0, u0, v0)
        y, u, v = cdef_all(y, u, v)
        a, b, c = lr_all()
        # fold every stage's result into a tiny carry so nothing is DCE'd
        carry = (m[0].ravel()[0] + m[1].ravel()[0] + m[2].ravel()[0] +
                 r[0, 0, 0] + y[0, 0] + u[0, 0] + v[0, 0] +
                 a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0])
        return y, u, v, carry

    def chain(n):
        y, u, v, carry = y_plane, u_plane, v_plane, jnp.int32(0)
        for _ in range(n):
            y, u, v, carry = frame_step(pred, coefs, y + (carry & 0),
                                        u, v)
        return carry

    def run(n):
        t0 = time.perf_counter()
        int(np.asarray(chain(n)))       # host fetch = true sync
        return time.perf_counter() - t0

    run(1)                              # compile + warm
    rt = min(run(1) for _ in range(3))  # fixed round-trip cost
    iters = 20
    dt = max(run(iters) - rt, 1e-6)

    pix_per_frame = W * H * 1.5
    mpix = pix_per_frame * iters / dt / 1e6
    return mpix, pix_per_frame / (dt / iters), str(jax.devices()[0])


def bench_dav1d_baseline():
    """dav1d single-thread Mpix/s on a generated stream with deblock + CDEF
    + wiener LR enabled. Returns 0.0 if the oracle binary is missing."""
    if not os.path.exists(ORACLE):
        return 0.0, 0
    from dav1d_mirror_tpu.host import headers as h
    from dav1d_mirror_tpu.testing.streamgen import (
        RandomPolicy, make_seq_hdr, make_key_frame_hdr, gen_intra_frame,
        gen_ivf)

    W, H, REPS = 448, 256, 40
    seq = make_seq_hdr(W, H)
    seq.cdef = 1
    seq.restoration = 1
    fhdr = make_key_frame_hdr(
        seq, qidx=110, txfm_mode=h.TX_LARGEST,
        loopfilter=(28, 28, 22, 18, 1),
        cdef_params=dict(damping=4, n_bits=1, y_strength=[6, 11],
                         uv_strength=[3, 0]))
    fhdr.restoration_type = [2, 2, 2]
    fhdr.restoration_unit_size = [6, 6]
    tile, _ = gen_intra_frame(seq, fhdr, RandomPolicy(7))
    ivf = gen_ivf(seq, [(fhdr, tile)] * REPS)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "b.ivf")
        with open(src, "wb") as fo:
            fo.write(ivf)
        # warm
        subprocess.run([ORACLE, "-i", src, "--muxer", "null", "-q",
                        "--threads", "1"], capture_output=True)
        t0 = time.perf_counter()
        r = subprocess.run([ORACLE, "-i", src, "--muxer", "null", "-q",
                            "--threads", "1"], capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return 0.0, 0
    mpix = W * H * 1.5 * REPS / dt / 1e6
    return mpix, REPS / dt


def bench_e2e_host():
    """Honest end-to-end decode fps of OUR decoder (host-recon settings;
    the host entropy stage — Python mode walk + native C msac — plus
    numpy reconstruction) on the same stream class as the dav1d
    baseline. Records where full-pipeline decode stands, not just the
    device kernels."""
    try:
        from dav1d_mirror_tpu.host import headers as h
        from dav1d_mirror_tpu.testing.streamgen import (
            RandomPolicy, make_seq_hdr, make_key_frame_hdr,
            gen_intra_frame, gen_ivf)
        import dav1d_mirror_tpu.api as api
        from dav1d_mirror_tpu.host.demux import open_demuxer

        W, H, REPS = 448, 256, 10
        seq = make_seq_hdr(W, H)
        fhdr = make_key_frame_hdr(seq, qidx=110, txfm_mode=h.TX_LARGEST,
                                  loopfilter=(28, 28, 22, 18, 1))
        tile, _ = gen_intra_frame(seq, fhdr, RandomPolicy(7))
        ivf = gen_ivf(seq, [(fhdr, tile)] * REPS)
        dec = api.Decoder(api.Settings(logger=None))
        _, units = open_demuxer(ivf)
        units = list(units)
        n = 0
        t0 = time.perf_counter()
        for obus in units:
            dec.send_obus(obus)
            while dec.get_picture() is not None:
                n += 1
        dt = time.perf_counter() - t0
        return round(n / dt, 2)
    except Exception:
        return 0.0


def main():
    mpix, pix_s, device = bench_device_pipeline()
    base_mpix, base_fps = bench_dav1d_baseline()
    e2e_fps = bench_e2e_host()
    vs = round(mpix / base_mpix, 3) if base_mpix else 0.0
    print(json.dumps({
        "metric": "device_pixel_pipeline_Mpix_per_sec",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": vs,
        "detail": {
            "fps_1080p_equiv": round(pix_s / (1920 * 1088 * 1.5), 2),
            "device": device,
            "stages": "mc-8tap(3pl), itx16x16+add, deblock(3pl), cdef, "
                      "wiener-LR",
            "baseline": "dav1d 1-thread CPU, 448x256 intra stream with "
                        "same filter stages, Mpix/s",
            "baseline_Mpix_per_sec": round(base_mpix, 2),
            "e2e_host_fps_448x256": e2e_fps,
            "note": "host entropy stage not included; synthetic 1080p "
                    "content for device stages",
        },
    }))


if __name__ == "__main__":
    main()
