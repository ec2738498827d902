"""NumPy reference film grain synthesis (bit-exact).

Semantics per AV1 spec 7.18.3, cross-checked vs dav1d
src/filmgrain_tmpl.c (grain generation, 32x32 block application with overlap)
and src/fg_apply_tmpl.c (scaling LUT, plane driver).
"""
from __future__ import annotations

import numpy as np

from ...data.tables import TABLES

GAUSSIAN = TABLES["gaussian_sequence"].astype(np.int32)  # [2048]
GRAIN_WIDTH, GRAIN_HEIGHT = 82, 73
SUB_GRAIN_WIDTH, SUB_GRAIN_HEIGHT = 44, 38
FG_BLOCK_SIZE = 32


def _rand(state, bits):
    r = state
    bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
    state = (r >> 1) | (bit << 15)
    return state, (state >> (16 - bits)) & ((1 << bits) - 1)


def _round2(x, shift):
    return (x + ((1 << shift) >> 1)) >> shift


def generate_grain_y(fgd, bitdepth):
    bd_m8 = bitdepth - 8
    seed = fgd.seed
    shift = 4 - bd_m8 + fgd.grain_scale_shift
    grain_ctr = 128 << bd_m8
    gmin, gmax = -grain_ctr, grain_ctr - 1

    buf = np.zeros((GRAIN_HEIGHT, GRAIN_WIDTH), np.int32)
    for y in range(GRAIN_HEIGHT):
        for x in range(GRAIN_WIDTH):
            seed, v = _rand(seed, 11)
            buf[y, x] = _round2(int(GAUSSIAN[v]), shift)

    lag = fgd.ar_coeff_lag
    pad = 3
    coeffs = fgd.ar_coeffs_y
    for y in range(pad, GRAIN_HEIGHT):
        for x in range(pad, GRAIN_WIDTH - pad):
            s = 0
            ci = 0
            for dy in range(-lag, 1):
                for dx in range(-lag, lag + 1):
                    if dx == 0 and dy == 0:
                        break
                    s += int(coeffs[ci]) * int(buf[y + dy, x + dx])
                    ci += 1
            g = int(buf[y, x]) + _round2(s, fgd.ar_coeff_shift)
            buf[y, x] = max(gmin, min(gmax, g))
    return buf


def generate_grain_uv(fgd, buf_y, uv, subx, suby, bitdepth):
    bd_m8 = bitdepth - 8
    seed = fgd.seed ^ (0x49D8 if uv else 0xB524)
    shift = 4 - bd_m8 + fgd.grain_scale_shift
    grain_ctr = 128 << bd_m8
    gmin, gmax = -grain_ctr, grain_ctr - 1
    cw = SUB_GRAIN_WIDTH if subx else GRAIN_WIDTH
    ch = SUB_GRAIN_HEIGHT if suby else GRAIN_HEIGHT

    buf = np.zeros((GRAIN_HEIGHT + 1, GRAIN_WIDTH), np.int32)
    for y in range(ch):
        for x in range(cw):
            seed, v = _rand(seed, 11)
            buf[y, x] = _round2(int(GAUSSIAN[v]), shift)

    lag = fgd.ar_coeff_lag
    pad = 3
    coeffs = fgd.ar_coeffs_uv[uv]
    for y in range(pad, ch):
        for x in range(pad, cw - pad):
            s = 0
            ci = 0
            done = False
            for dy in range(-lag, 1):
                if done:
                    break
                for dx in range(-lag, lag + 1):
                    if dx == 0 and dy == 0:
                        if not fgd.num_y_points:
                            done = True
                            break
                        luma = 0
                        lx = ((x - pad) << subx) + pad
                        ly = ((y - pad) << suby) + pad
                        for i in range(suby + 1):
                            for j in range(subx + 1):
                                luma += int(buf_y[ly + i, lx + j])
                        luma = _round2(luma, subx + suby)
                        s += luma * int(coeffs[ci])
                        done = True
                        break
                    s += int(coeffs[ci]) * int(buf[y + dy, x + dx])
                    ci += 1
            g = int(buf[y, x]) + _round2(s, fgd.ar_coeff_shift)
            buf[y, x] = max(gmin, min(gmax, g))
    return buf


def generate_scaling(bitdepth, points, num):
    shift_x = 0 if bitdepth == 8 else bitdepth - 8
    size = 256 if bitdepth == 8 else (1 << bitdepth)
    scaling = np.zeros(size, np.int32)
    if num == 0:
        return scaling
    scaling[:points[0][0] << shift_x] = points[0][1]
    for i in range(num - 1):
        bx, by = points[i]
        ex, ey = points[i + 1]
        dx = ex - bx
        dy = ey - by
        delta = dy * ((0x10000 + (dx >> 1)) // dx)
        d = 0x8000
        for x in range(dx):
            scaling[(bx + x) << shift_x] = by + (d >> 16)
            d += delta
    n = points[num - 1][0] << shift_x
    scaling[n:] = points[num - 1][1]
    if bitdepth > 8:
        pad = 1 << shift_x
        rnd = pad >> 1
        for i in range(num - 1):
            bx = points[i][0] << shift_x
            ex = points[i + 1][0] << shift_x
            for x in range(0, ex - bx, pad):
                rng = int(scaling[bx + x + pad]) - int(scaling[bx + x])
                r = rnd
                for k in range(1, pad):
                    r += rng
                    scaling[bx + x + k] = int(scaling[bx + x]) + (r >> shift_x)
    return scaling


def _row_seeds(fgd, row_num, rows):
    seeds = []
    for i in range(rows):
        s = fgd.seed
        s ^= (((row_num - i) * 37 + 178) & 0xFF) << 8
        s ^= ((row_num - i) * 173 + 105) & 0xFF
        seeds.append(s)
    return seeds


def _sample_lut(grain_lut, offsets, subx, suby, bx, by, x, y):
    randval = offsets[bx][by]
    offx = 3 + (2 >> subx) * (3 + (randval >> 4))
    offy = 3 + (2 >> suby) * (3 + (randval & 0xF))
    return int(grain_lut[offy + y + (FG_BLOCK_SIZE >> suby) * by,
                         offx + x + (FG_BLOCK_SIZE >> subx) * bx])


def fgy_row(dst, src, fgd, pw, scaling, grain_lut, bh, row_num, bitdepth):
    """dst/src: (bh, >=pw) views of the output/input rows."""
    overlap = fgd.overlap_flag
    rows = 1 + (overlap and row_num > 0)
    bd_m8 = bitdepth - 8
    grain_ctr = 128 << bd_m8
    gmin, gmax = -grain_ctr, grain_ctr - 1
    if fgd.clip_to_restricted_range:
        min_v, max_v = 16 << bd_m8, 235 << bd_m8
    else:
        min_v, max_v = 0, (1 << bitdepth) - 1
    seeds = _row_seeds(fgd, row_num, rows)
    offsets = [[0, 0], [0, 0]]
    W = [[27, 17], [17, 27]]

    def noise(x, y, grain):
        sv = int(src[y, x + bx])
        nz = _round2(int(scaling[sv]) * grain, fgd.scaling_shift)
        dst[y, x + bx] = max(min_v, min(max_v, sv + nz))

    for bx in range(0, pw, FG_BLOCK_SIZE):
        bw = min(FG_BLOCK_SIZE, pw - bx)
        if overlap and bx:
            for i in range(rows):
                offsets[1][i] = offsets[0][i]
        for i in range(rows):
            seeds[i], offsets[0][i] = _rand(seeds[i], 8)
        ystart = min(2, bh) if (overlap and row_num) else 0
        xstart = min(2, bw) if (overlap and bx) else 0

        for y in range(ystart, bh):
            for x in range(xstart, bw):
                g = _sample_lut(grain_lut, offsets, 0, 0, 0, 0, x, y)
                noise(x, y, g)
            for x in range(xstart):
                g = _sample_lut(grain_lut, offsets, 0, 0, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, 0, 0, 1, 0, x, y)
                g = _round2(old * W[x][0] + g * W[x][1], 5)
                g = max(gmin, min(gmax, g))
                noise(x, y, g)
        for y in range(ystart):
            for x in range(xstart, bw):
                g = _sample_lut(grain_lut, offsets, 0, 0, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, 0, 0, 0, 1, x, y)
                g = _round2(old * W[y][0] + g * W[y][1], 5)
                g = max(gmin, min(gmax, g))
                noise(x, y, g)
            for x in range(xstart):
                top = _sample_lut(grain_lut, offsets, 0, 0, 0, 1, x, y)
                old = _sample_lut(grain_lut, offsets, 0, 0, 1, 1, x, y)
                top = _round2(old * W[x][0] + top * W[x][1], 5)
                top = max(gmin, min(gmax, top))
                g = _sample_lut(grain_lut, offsets, 0, 0, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, 0, 0, 1, 0, x, y)
                g = _round2(old * W[x][0] + g * W[x][1], 5)
                g = max(gmin, min(gmax, g))
                g = _round2(top * W[y][0] + g * W[y][1], 5)
                g = max(gmin, min(gmax, g))
                noise(x, y, g)


def fguv_row(dst, src, fgd, cpw, scaling, grain_lut, bh, row_num, luma,
             uv, is_id, sx, sy, bitdepth):
    """dst/src: (bh, >=cpw) chroma views; luma: ((bh<<sy), ...) luma rows."""
    overlap = fgd.overlap_flag
    rows = 1 + (overlap and row_num > 0)
    bd_m8 = bitdepth - 8
    grain_ctr = 128 << bd_m8
    gmin, gmax = -grain_ctr, grain_ctr - 1
    if fgd.clip_to_restricted_range:
        min_v = 16 << bd_m8
        max_v = (235 if is_id else 240) << bd_m8
    else:
        min_v, max_v = 0, (1 << bitdepth) - 1
    seeds = _row_seeds(fgd, row_num, rows)
    offsets = [[0, 0], [0, 0]]
    W = [[[27, 17], [17, 27]], [[23, 22], [0, 0]]]
    bd_max = (1 << bitdepth) - 1

    def noise(bx, x, y, grain):
        lx = (bx + x) << sx
        ly = y << sy
        avg = int(luma[ly, lx])
        if sx:
            avg = (avg + int(luma[ly, lx + 1]) + 1) >> 1
        sv = int(src[y, bx + x])
        val = avg
        if not fgd.chroma_scaling_from_luma:
            combined = avg * fgd.uv_luma_mult[uv] + sv * fgd.uv_mult[uv]
            val = max(0, min(bd_max,
                             (combined >> 6) +
                             fgd.uv_offset[uv] * (1 << bd_m8)))
        nz = _round2(int(scaling[val]) * grain, fgd.scaling_shift)
        dst[y, bx + x] = max(min_v, min(max_v, sv + nz))

    step = FG_BLOCK_SIZE >> sx
    for bx in range(0, cpw, step):
        bw = min(step, cpw - bx)
        if overlap and bx:
            for i in range(rows):
                offsets[1][i] = offsets[0][i]
        for i in range(rows):
            seeds[i], offsets[0][i] = _rand(seeds[i], 8)
        ystart = min(2 >> sy, bh) if (overlap and row_num) else 0
        xstart = min(2 >> sx, bw) if (overlap and bx) else 0

        for y in range(ystart, bh):
            for x in range(xstart, bw):
                g = _sample_lut(grain_lut, offsets, sx, sy, 0, 0, x, y)
                noise(bx, x, y, g)
            for x in range(xstart):
                g = _sample_lut(grain_lut, offsets, sx, sy, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, sx, sy, 1, 0, x, y)
                g = _round2(old * W[sx][x][0] + g * W[sx][x][1], 5)
                g = max(gmin, min(gmax, g))
                noise(bx, x, y, g)
        for y in range(ystart):
            for x in range(xstart, bw):
                g = _sample_lut(grain_lut, offsets, sx, sy, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, sx, sy, 0, 1, x, y)
                g = _round2(old * W[sy][y][0] + g * W[sy][y][1], 5)
                g = max(gmin, min(gmax, g))
                noise(bx, x, y, g)
            for x in range(xstart):
                top = _sample_lut(grain_lut, offsets, sx, sy, 0, 1, x, y)
                old = _sample_lut(grain_lut, offsets, sx, sy, 1, 1, x, y)
                top = _round2(old * W[sx][x][0] + top * W[sx][x][1], 5)
                top = max(gmin, min(gmax, top))
                g = _sample_lut(grain_lut, offsets, sx, sy, 0, 0, x, y)
                old = _sample_lut(grain_lut, offsets, sx, sy, 1, 0, x, y)
                g = _round2(old * W[sx][x][0] + g * W[sx][x][1], 5)
                g = max(gmin, min(gmax, g))
                g = _round2(top * W[sy][y][0] + g * W[sy][y][1], 5)
                g = max(gmin, min(gmax, g))
                noise(bx, x, y, g)


def apply_film_grain(planes_in, seq, fhdr, width, height):
    """planes_in: list of visible-size plane arrays (will not be modified).
    Returns grained output planes (same shapes)."""
    fgd = fhdr.film_grain_data
    bitdepth = seq.bitdepth
    ss_x = 1 if seq.layout != 3 else 0  # I444
    ss_y = 1 if seq.layout == 1 else 0  # I420
    monochrome = seq.layout == 0
    is_id = seq.mtrx == 0

    out = [p.copy() for p in planes_in]
    grain_y = generate_grain_y(fgd, bitdepth)
    grain_uv = [None, None]
    scaling = [None, None, None]
    if not monochrome:
        if fgd.num_uv_points[0] or fgd.chroma_scaling_from_luma:
            grain_uv[0] = generate_grain_uv(fgd, grain_y, 0, ss_x, ss_y,
                                            bitdepth)
        if fgd.num_uv_points[1] or fgd.chroma_scaling_from_luma:
            grain_uv[1] = generate_grain_uv(fgd, grain_y, 1, ss_x, ss_y,
                                            bitdepth)
    if fgd.num_y_points or fgd.chroma_scaling_from_luma:
        scaling[0] = generate_scaling(bitdepth, fgd.y_points,
                                      fgd.num_y_points)
    for pl in range(2):
        if not monochrome and fgd.num_uv_points[pl]:
            scaling[1 + pl] = generate_scaling(bitdepth, fgd.uv_points[pl],
                                               fgd.num_uv_points[pl])

    # planes_in are the PADDED reconstruction planes; for odd widths the
    # reference overwrites the first pad column with the last visible one
    luma_in = planes_in[0]
    if not monochrome and (width & ss_x):
        luma_in = planes_in[0].copy()
        luma_in[:, width] = luma_in[:, width - 1]

    n_rows = (height + FG_BLOCK_SIZE - 1) // FG_BLOCK_SIZE
    cpw = (width + ss_x) >> ss_x
    for row in range(n_rows):
        y0 = row * FG_BLOCK_SIZE
        bh = min(height - y0, FG_BLOCK_SIZE)
        if fgd.num_y_points:
            fgy_row(out[0][y0:y0 + bh], planes_in[0][y0:y0 + bh], fgd,
                    width, scaling[0], grain_y, bh, row, bitdepth)
        if monochrome or not (fgd.num_uv_points[0] or fgd.num_uv_points[1]
                              or fgd.chroma_scaling_from_luma):
            continue
        cbh = (min(height - y0, FG_BLOCK_SIZE) + ss_y) >> ss_y
        cy0 = y0 >> ss_y
        luma_rows = luma_in[y0:y0 + (cbh << ss_y)]
        for pl in range(2):
            if fgd.chroma_scaling_from_luma:
                sc = scaling[0]
            elif fgd.num_uv_points[pl]:
                sc = scaling[1 + pl]
            else:
                continue
            fguv_row(out[1 + pl][cy0:cy0 + cbh],
                     planes_in[1 + pl][cy0:cy0 + cbh], fgd, cpw, sc,
                     grain_uv[pl], cbh, row, luma_rows, pl, is_id, ss_x,
                     ss_y, bitdepth)
    return out
