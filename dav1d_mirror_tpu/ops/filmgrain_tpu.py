"""Film grain synthesis on TPU (dav1d src/fg_apply_tmpl.c +
src/filmgrain_tmpl.c:169-421, re-designed device-first).

The reference parallelises grain application over 32-row blocks with a
worker pool (delayed-fg tasks, src/thread_task.c:465-548). On TPU the
whole frame is one data-parallel op: the only sequential parts — the AR
grain LUT filter and the per-block LFSR offset chain — are tiny and stay
on the host (82x73 ints; one u16 per 32x32 block). Application is then
pure gathers + elementwise VPU math:

  per pixel: gather 4 grain patches (cur / left / top / topleft block
  offsets), blend the 2-px overlap bands with the spec's 27/17 (23/22)
  weights, look up the piecewise-linear scaling LUT at the (luma-mixed)
  source value, add round2(scaling * grain, shift), clip.

Everything is int32; results are bit-exact with ops/ref/filmgrain.py
(and therefore with the reference decoder).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ref.filmgrain import (FG_BLOCK_SIZE, GRAIN_WIDTH, _rand, _row_seeds,
                            generate_grain_y, generate_grain_uv,
                            generate_scaling)


def block_randvals(fgd, n_rows: int, n_bx: int) -> np.ndarray:
    """Per-(block-row, block-col) 8-bit offset seeds R[r][b].

    Row r's chain starts from the row seed (filmgrain_tmpl.c row_num
    hash) and advances once per 32-px block column; the overlap reads
    for row r use row r-1's chain at the same columns, i.e. R[r-1][b].
    """
    R = np.zeros((n_rows, n_bx), np.int32)
    for r in range(n_rows):
        seed = _row_seeds(fgd, r, 1)[0]
        for b in range(n_bx):
            seed, v = _rand(seed, 8)
            R[r, b] = v
    return R


def _off_maps(R, sx, sy):
    """randval grid -> (offy, offx) grids (filmgrain_tmpl.c offsets)."""
    offx = 3 + (2 >> sx) * (3 + (R >> 4))
    offy = 3 + (2 >> sy) * (3 + (R & 0xF))
    return offy, offx


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _fg_blend_grain(lut, offyx, sx, sy, overlap, bh_step, step, gmax):
    """Per-pixel blended grain field for one plane.

    lut: grain LUT (h, 82) int32. offyx: (4, 2, nby, nbx) int32 —
    [cur/left/top/topleft][offy/offx] per block. Returns (H, W) int32
    grain (H = nby*bh_step, W = nbx*step)."""
    nby, nbx = offyx.shape[2], offyx.shape[3]
    H, W = nby * bh_step, nbx * step
    yy = jnp.arange(H, dtype=jnp.int32) % bh_step          # in-block y
    xx = jnp.arange(W, dtype=jnp.int32) % step             # in-block x
    by = jnp.arange(H, dtype=jnp.int32) // bh_step
    bx = jnp.arange(W, dtype=jnp.int32) // step

    def patch(which, dy, dx):
        oy = offyx[which, 0][by[:, None], bx[None, :]] + yy[:, None] + dy
        ox = offyx[which, 1][by[:, None], bx[None, :]] + xx[None, :] + dx
        idx = oy * GRAIN_WIDTH + ox
        return jnp.take(lut.reshape(-1), idx, mode="clip")

    g = patch(0, 0, 0)
    if not overlap:
        return g

    g_l = patch(1, 0, step)
    g_t = patch(2, bh_step, 0)
    g_tl = patch(3, bh_step, step)
    gmin = -gmax - 1

    def r2c(a, w0, b, w1):
        return jnp.clip((a * w0 + b * w1 + 16) >> 5, gmin, gmax)

    # horizontal 27/17 (or 23/22 when subsampled) overlap columns
    if sx:
        xw0 = jnp.where(xx == 0, 23, 0)[None, :]
        xw1 = jnp.where(xx == 0, 22, 0)[None, :]
        xm = (xx < 1)[None, :] & (bx > 0)[None, :]
    else:
        xw0 = jnp.where(xx == 0, 27, 17)[None, :]
        xw1 = jnp.where(xx == 0, 17, 27)[None, :]
        xm = (xx < 2)[None, :] & (bx > 0)[None, :]
    g1 = jnp.where(xm, r2c(g_l, xw0, g, xw1), g)
    t1 = jnp.where(xm, r2c(g_tl, xw0, g_t, xw1), g_t)

    # vertical overlap rows
    if sy:
        yw0 = jnp.where(yy == 0, 23, 0)[:, None]
        yw1 = jnp.where(yy == 0, 22, 0)[:, None]
        ym = (yy < 1)[:, None] & (by > 0)[:, None]
    else:
        yw0 = jnp.where(yy == 0, 27, 17)[:, None]
        yw1 = jnp.where(yy == 0, 17, 27)[:, None]
        ym = (yy < 2)[:, None] & (by > 0)[:, None]
    return jnp.where(ym, r2c(t1, yw0, g1, yw1), g1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _fgy_apply(src, grain, scaling, scaling_shift, bitdepth, clip):
    bd_m8 = bitdepth - 8
    if clip:
        min_v, max_v = 16 << bd_m8, 235 << bd_m8
    else:
        min_v, max_v = 0, (1 << bitdepth) - 1
    sc = jnp.take(scaling, src, mode="clip")
    noise = (sc * grain + ((1 << scaling_shift) >> 1)) >> scaling_shift
    return jnp.clip(src + noise, min_v, max_v)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _fguv_apply(src, luma, grain, scaling, scaling_shift, bitdepth, clip,
                is_id, sx, csfl, uv_luma_mult, uv_mult, uv_offset):
    bd_m8 = bitdepth - 8
    bd_max = (1 << bitdepth) - 1
    if clip:
        min_v = 16 << bd_m8
        max_v = (235 if is_id else 240) << bd_m8
    else:
        min_v, max_v = 0, bd_max
    lu = luma[::2] if luma.shape[0] != src.shape[0] else luma
    if sx:
        avg = (lu[:, 0::2] + lu[:, 1::2] + 1) >> 1
    else:
        avg = lu
    avg = avg[:src.shape[0], :src.shape[1]]
    if csfl:
        val = avg
    else:
        combined = avg * uv_luma_mult + src * uv_mult
        val = jnp.clip((combined >> 6) + uv_offset * (1 << bd_m8), 0,
                       bd_max)
    sc = jnp.take(scaling, val, mode="clip")
    noise = (sc * grain + ((1 << scaling_shift) >> 1)) >> scaling_shift
    return jnp.clip(src + noise, min_v, max_v)


def apply_film_grain_tpu(planes_in, seq, fhdr, width, height):
    """Device counterpart of ops/ref/filmgrain.apply_film_grain: same
    inputs/outputs (list of visible-size numpy planes)."""
    fgd = fhdr.film_grain_data
    bitdepth = seq.bitdepth
    ss_x = 1 if seq.layout != 3 else 0
    ss_y = 1 if seq.layout == 1 else 0
    monochrome = seq.layout == 0
    is_id = seq.mtrx == 0
    overlap = bool(fgd.overlap_flag)
    bd_m8 = bitdepth - 8
    gmax = (128 << bd_m8) - 1

    out = [np.asarray(p).copy() for p in planes_in]
    n_rows = (height + FG_BLOCK_SIZE - 1) // FG_BLOCK_SIZE
    n_bx = (width + FG_BLOCK_SIZE - 1) // FG_BLOCK_SIZE
    R = block_randvals(fgd, n_rows, n_bx)
    lut_y = generate_grain_y(fgd, bitdepth)

    def off_tensor(sx, sy):
        oy, ox = _off_maps(R, sx, sy)
        z = np.zeros_like(oy)
        left = np.concatenate([z[:, :1], oy[:, :-1]], 1), \
            np.concatenate([z[:, :1], ox[:, :-1]], 1)
        top = np.concatenate([z[:1], oy[:-1]], 0), \
            np.concatenate([z[:1], ox[:-1]], 0)
        tl = np.concatenate([z[:1], left[0][:-1]], 0), \
            np.concatenate([z[:1], left[1][:-1]], 0)
        return jnp.asarray(np.stack([
            np.stack([oy, ox]), np.stack(left), np.stack(top),
            np.stack(tl)]).astype(np.int32))

    def pad_to(a, hh, ww):
        return np.pad(a, ((0, hh - a.shape[0]), (0, ww - a.shape[1])))

    # luma
    if fgd.num_y_points:
        sc_y = generate_scaling(bitdepth, fgd.y_points, fgd.num_y_points)
        H, W = n_rows * FG_BLOCK_SIZE, n_bx * FG_BLOCK_SIZE
        grain = _fg_blend_grain(jnp.asarray(lut_y), off_tensor(0, 0),
                                0, 0, overlap, FG_BLOCK_SIZE,
                                FG_BLOCK_SIZE, gmax)
        src = jnp.asarray(pad_to(np.asarray(planes_in[0][:height, :width],
                                            np.int32), H, W))
        res = _fgy_apply(src, grain, jnp.asarray(sc_y),
                         int(fgd.scaling_shift), bitdepth,
                         bool(fgd.clip_to_restricted_range))
        out[0][:height, :width] = \
            np.asarray(res)[:height, :width].astype(out[0].dtype)

    if monochrome or not (fgd.num_uv_points[0] or fgd.num_uv_points[1]
                          or fgd.chroma_scaling_from_luma):
        return out

    # chroma: luma source with odd-width column replication (reference
    # fg_apply_tmpl.c behaviour mirrored by ops/ref/filmgrain.py:329-332)
    luma_in = np.asarray(planes_in[0], np.int32)
    if width & ss_x:
        luma_in = luma_in.copy()
        luma_in[:, width] = luma_in[:, width - 1]

    step = FG_BLOCK_SIZE >> ss_x
    bh_step = FG_BLOCK_SIZE >> ss_y
    cpw = (width + ss_x) >> ss_x
    cph = (height + ss_y) >> ss_y
    Hc, Wc = n_rows * bh_step, n_bx * step
    offs = off_tensor(ss_x, ss_y)
    luma_pad = pad_to(luma_in[:cph << ss_y, :cpw << ss_x],
                      Hc << ss_y, Wc << ss_x)

    sc_luma = None
    for pl in range(2):
        if fgd.chroma_scaling_from_luma:
            if sc_luma is None:
                sc_luma = generate_scaling(bitdepth, fgd.y_points,
                                           fgd.num_y_points)
            sc = sc_luma
        elif fgd.num_uv_points[pl]:
            sc = generate_scaling(bitdepth, fgd.uv_points[pl],
                                  fgd.num_uv_points[pl])
        else:
            continue
        lut_uv = generate_grain_uv(fgd, lut_y, pl, ss_x, ss_y, bitdepth)
        grain = _fg_blend_grain(jnp.asarray(lut_uv), offs, ss_x, ss_y,
                                overlap, bh_step, step, gmax)
        src = jnp.asarray(pad_to(
            np.asarray(planes_in[1 + pl][:cph, :cpw], np.int32), Hc, Wc))
        res = _fguv_apply(src, jnp.asarray(luma_pad), grain,
                          jnp.asarray(sc), int(fgd.scaling_shift),
                          bitdepth, bool(fgd.clip_to_restricted_range),
                          bool(is_id), ss_x,
                          bool(fgd.chroma_scaling_from_luma),
                          int(fgd.uv_luma_mult[pl]),
                          int(fgd.uv_mult[pl]), int(fgd.uv_offset[pl]))
        out[1 + pl][:cph, :cpw] = \
            np.asarray(res)[:cph, :cpw].astype(out[1 + pl].dtype)
    return out
