/* Test-oracle shim: exposes the reference decoder's (static) C DSP kernels as
 * flat, ctypes-callable symbols so the TPU framework's kernels can be
 * golden-tested against them (the checkasm analogue, with the reference C as
 * the "ref" side and our NumPy/JAX kernels as the "new" side).
 *
 * Compiled once per BITDEPTH (8/16) into liboracle_dsp.so. Not linked into
 * the framework.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

#include "common/bitdepth.h"
#include "common/attributes.h"

#include "src/itx.h"
#include "src/ipred.h"
#include "src/mc.h"
#include "src/loopfilter.h"
#include "src/cdef.h"
#include "src/looprestoration.h"
#include "src/filmgrain.h"

#define EXPORT __attribute__((visibility("default")))

/* ---- itx ---- */
static Dav1dInvTxfmDSPContext itx_c;
static int itx_done;

EXPORT void bitfn(oracle_itx_add)(pixel *dst, ptrdiff_t stride, coef *coeff,
                                  int eob, int tx, int txtp, int bpc,
                                  int bitdepth_max_arg)
{
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    if (!itx_done) { bitfn(dav1d_itx_dsp_init)(&itx_c, bpc); itx_done = 1; }
    itx_c.itxfm_add[tx][txtp](dst, stride, coeff, eob HIGHBD_TAIL_SUFFIX);
}

/* ---- ipred ---- */
static Dav1dIntraPredDSPContext ipred_c;
static int ipred_done;

EXPORT void bitfn(oracle_intra_pred)(int mode, pixel *dst, ptrdiff_t stride,
                                     const pixel *topleft, int width,
                                     int height, int angle, int max_width,
                                     int max_height, int bitdepth_max_arg)
{
    if (!ipred_done) { bitfn(dav1d_intra_pred_dsp_init)(&ipred_c); ipred_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    ipred_c.intra_pred[mode](dst, stride, topleft, width, height, angle,
                             max_width, max_height HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_cfl_ac)(int layout_minus_1, int16_t *ac,
                                 const pixel *ypx, ptrdiff_t stride,
                                 int w_pad, int h_pad, int cw, int ch)
{
    if (!ipred_done) { bitfn(dav1d_intra_pred_dsp_init)(&ipred_c); ipred_done = 1; }
    ipred_c.cfl_ac[layout_minus_1](ac, ypx, stride, w_pad, h_pad, cw, ch);
}

EXPORT void bitfn(oracle_cfl_pred)(int mode, pixel *dst, ptrdiff_t stride,
                                   const pixel *topleft, int width, int height,
                                   const int16_t *ac, int alpha,
                                   int bitdepth_max_arg)
{
    if (!ipred_done) { bitfn(dav1d_intra_pred_dsp_init)(&ipred_c); ipred_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    ipred_c.cfl_pred[mode](dst, stride, topleft, width, height, ac, alpha
                           HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_pal_pred)(pixel *dst, ptrdiff_t stride,
                                   const pixel *pal, const uint8_t *idx,
                                   int w, int h)
{
    if (!ipred_done) { bitfn(dav1d_intra_pred_dsp_init)(&ipred_c); ipred_done = 1; }
    ipred_c.pal_pred(dst, stride, pal, idx, w, h);
}

/* ---- mc ---- */
static Dav1dMCDSPContext mc_c;
static int mc_done;
static void mc_init(void) {
    if (!mc_done) { bitfn(dav1d_mc_dsp_init)(&mc_c); mc_done = 1; }
}

EXPORT void bitfn(oracle_mc_put)(int filter2d, pixel *dst, ptrdiff_t dst_stride,
                                 const pixel *src, ptrdiff_t src_stride,
                                 int w, int h, int mx, int my,
                                 int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.mc[filter2d](dst, dst_stride, src, src_stride, w, h, mx, my
                      HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_mc_prep)(int filter2d, int16_t *tmp, const pixel *src,
                                  ptrdiff_t src_stride, int w, int h,
                                  int mx, int my, int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.mct[filter2d](tmp, src, src_stride, w, h, mx, my HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_mc_put_scaled)(int filter2d, pixel *dst,
                                        ptrdiff_t dst_stride, const pixel *src,
                                        ptrdiff_t src_stride, int w, int h,
                                        int mx, int my, int dx, int dy,
                                        int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.mc_scaled[filter2d](dst, dst_stride, src, src_stride, w, h, mx, my,
                             dx, dy HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_mc_prep_scaled)(int filter2d, int16_t *tmp,
                                         const pixel *src, ptrdiff_t src_stride,
                                         int w, int h, int mx, int my,
                                         int dx, int dy, int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.mct_scaled[filter2d](tmp, src, src_stride, w, h, mx, my, dx, dy
                              HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_avg)(pixel *dst, ptrdiff_t stride,
                              const int16_t *tmp1, const int16_t *tmp2,
                              int w, int h, int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.avg(dst, stride, tmp1, tmp2, w, h HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_w_avg)(pixel *dst, ptrdiff_t stride,
                                const int16_t *tmp1, const int16_t *tmp2,
                                int w, int h, int weight, int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.w_avg(dst, stride, tmp1, tmp2, w, h, weight HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_mask)(pixel *dst, ptrdiff_t stride,
                               const int16_t *tmp1, const int16_t *tmp2,
                               int w, int h, const uint8_t *mask,
                               int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.mask(dst, stride, tmp1, tmp2, w, h, mask HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_w_mask)(int ss, pixel *dst, ptrdiff_t stride,
                                 const int16_t *tmp1, const int16_t *tmp2,
                                 int w, int h, uint8_t *mask, int sign,
                                 int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.w_mask[ss](dst, stride, tmp1, tmp2, w, h, mask, sign
                    HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_blend)(pixel *dst, ptrdiff_t stride, const pixel *tmp,
                                int w, int h, const uint8_t *mask)
{
    mc_init();
    mc_c.blend(dst, stride, tmp, w, h, mask);
}

EXPORT void bitfn(oracle_blend_v)(pixel *dst, ptrdiff_t stride,
                                  const pixel *tmp, int w, int h)
{
    mc_init();
    mc_c.blend_v(dst, stride, tmp, w, h);
}

EXPORT void bitfn(oracle_blend_h)(pixel *dst, ptrdiff_t stride,
                                  const pixel *tmp, int w, int h)
{
    mc_init();
    mc_c.blend_h(dst, stride, tmp, w, h);
}

EXPORT void bitfn(oracle_warp8x8)(pixel *dst, ptrdiff_t dst_stride,
                                  const pixel *src, ptrdiff_t src_stride,
                                  const int16_t *abcd, int mx, int my,
                                  int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.warp8x8(dst, dst_stride, src, src_stride, abcd, mx, my
                 HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_warp8x8t)(int16_t *tmp, ptrdiff_t tmp_stride,
                                   const pixel *src, ptrdiff_t src_stride,
                                   const int16_t *abcd, int mx, int my,
                                   int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.warp8x8t(tmp, tmp_stride, src, src_stride, abcd, mx, my
                  HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_emu_edge)(intptr_t bw, intptr_t bh, intptr_t iw,
                                   intptr_t ih, intptr_t x, intptr_t y,
                                   pixel *dst, ptrdiff_t dst_stride,
                                   const pixel *src, ptrdiff_t src_stride)
{
    mc_init();
    mc_c.emu_edge(bw, bh, iw, ih, x, y, dst, dst_stride, src, src_stride);
}

EXPORT void bitfn(oracle_resize)(pixel *dst, ptrdiff_t dst_stride,
                                 const pixel *src, ptrdiff_t src_stride,
                                 int dst_w, int h, int src_w, int dx, int mx0,
                                 int bitdepth_max_arg)
{
    mc_init();
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    mc_c.resize(dst, dst_stride, src, src_stride, dst_w, h, src_w, dx, mx0
                HIGHBD_TAIL_SUFFIX);
}

/* ---- loopfilter ---- */
static Dav1dLoopFilterDSPContext lf_c;
static int lf_done;

EXPORT void bitfn(oracle_loop_filter_sb)(int luma, int hv, pixel *dst,
                                         ptrdiff_t stride, const uint32_t *vmask,
                                         const uint8_t (*l)[4], ptrdiff_t b4_stride,
                                         const void *lut, int wh,
                                         int bitdepth_max_arg)
{
    if (!lf_done) { bitfn(dav1d_loop_filter_dsp_init)(&lf_c); lf_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    lf_c.loop_filter_sb[luma][hv](dst, stride, vmask, l, b4_stride,
                                  (const Av1FilterLUT *)lut, wh
                                  HIGHBD_TAIL_SUFFIX);
}

/* ---- cdef ---- */
static Dav1dCdefDSPContext cdef_c;
static int cdef_done;

EXPORT int bitfn(oracle_cdef_dir)(const pixel *dst, ptrdiff_t stride,
                                  unsigned *var, int bitdepth_max_arg)
{
    if (!cdef_done) { bitfn(dav1d_cdef_dsp_init)(&cdef_c); cdef_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    return cdef_c.dir(dst, stride, var HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_cdef_fb)(int layout_idx, pixel *dst, ptrdiff_t stride,
                                  const pixel (*left)[2], const pixel *top,
                                  const pixel *bottom, int pri_strength,
                                  int sec_strength, int dir, int damping,
                                  int edges, int bitdepth_max_arg)
{
    if (!cdef_done) { bitfn(dav1d_cdef_dsp_init)(&cdef_c); cdef_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    cdef_c.fb[layout_idx](dst, stride, left, top, bottom, pri_strength,
                          sec_strength, dir, damping,
                          (enum CdefEdgeFlags)edges HIGHBD_TAIL_SUFFIX);
}

/* ---- loop restoration ---- */
static Dav1dLoopRestorationDSPContext lr_c;
static int lr_done;

EXPORT void bitfn(oracle_wiener)(int idx, pixel *p, ptrdiff_t stride,
                                 const pixel (*left)[4], const pixel *lpf,
                                 int w, int h, const void *params,
                                 int edges, int bitdepth_max_arg)
{
    if (!lr_done) { bitfn(dav1d_loop_restoration_dsp_init)(&lr_c, BITDEPTH == 8 ? 8 : bitdepth_max_arg == 1023 ? 10 : 12); lr_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    lr_c.wiener[idx](p, stride, left, lpf, w, h,
                     (const LooprestorationParams *)params,
                     (enum LrEdgeFlags)edges HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_sgr)(int idx, pixel *p, ptrdiff_t stride,
                              const pixel (*left)[4], const pixel *lpf,
                              int w, int h, const void *params,
                              int edges, int bitdepth_max_arg)
{
    if (!lr_done) { bitfn(dav1d_loop_restoration_dsp_init)(&lr_c, BITDEPTH == 8 ? 8 : bitdepth_max_arg == 1023 ? 10 : 12); lr_done = 1; }
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    lr_c.sgr[idx](p, stride, left, lpf, w, h,
                  (const LooprestorationParams *)params,
                  (enum LrEdgeFlags)edges HIGHBD_TAIL_SUFFIX);
}

/* ---- film grain ---- */
static Dav1dFilmGrainDSPContext fg_c;
static int fg_done;
static void fg_init(void) {
    if (!fg_done) { bitfn(dav1d_film_grain_dsp_init)(&fg_c); fg_done = 1; }
}

EXPORT void bitfn(oracle_generate_grain_y)(entry *buf, const void *data,
                                           int bitdepth_max_arg)
{
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    fg_init();
    fg_c.generate_grain_y((entry (*)[GRAIN_WIDTH])buf,
                          (const Dav1dFilmGrainData *)data HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_generate_grain_uv)(int layout_idx, entry *buf,
                                            const entry *buf_y,
                                            const void *data, intptr_t uv,
                                            int bitdepth_max_arg)
{
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    fg_init();
    fg_c.generate_grain_uv[layout_idx]((entry (*)[GRAIN_WIDTH])buf,
                                       (const entry (*)[GRAIN_WIDTH])buf_y,
                                       (const Dav1dFilmGrainData *)data, uv
                                       HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_fgy_32x32xn)(pixel *dst_row, const pixel *src_row,
                                      ptrdiff_t stride, const void *data,
                                      size_t pw, const uint8_t *scaling,
                                      const entry *grain_lut, int bh,
                                      int row_num, int bitdepth_max_arg)
{
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    fg_init();
    fg_c.fgy_32x32xn(dst_row, src_row, stride,
                     (const Dav1dFilmGrainData *)data, pw, scaling,
                     (const entry (*)[GRAIN_WIDTH])grain_lut, bh, row_num
                     HIGHBD_TAIL_SUFFIX);
}

EXPORT void bitfn(oracle_fguv_32x32xn)(int layout_idx, pixel *dst_row,
                                       const pixel *src_row, ptrdiff_t stride,
                                       const void *data, size_t pw,
                                       const uint8_t *scaling,
                                       const entry *grain_lut, int bh,
                                       int row_num, const pixel *luma_row,
                                       ptrdiff_t luma_stride, int uv_pl,
                                       int is_id, int bitdepth_max_arg)
{
#if BITDEPTH == 16
    const int bitdepth_max = bitdepth_max_arg;
#endif
    (void)bitdepth_max_arg;
    fg_init();
    fg_c.fguv_32x32xn[layout_idx](dst_row, src_row, stride,
                                  (const Dav1dFilmGrainData *)data, pw,
                                  scaling,
                                  (const entry (*)[GRAIN_WIDTH])grain_lut, bh,
                                  row_num, luma_row, luma_stride, uv_pl, is_id
                                  HIGHBD_TAIL_SUFFIX);
}
