/* Bitdepth-independent oracle exports: msac range decoder + spec tables. */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

#include "src/msac.h"
#include "src/cdf.h"

#define EXPORT __attribute__((visibility("default")))

EXPORT size_t oracle_msac_sizeof(void) { return sizeof(MsacContext); }

EXPORT void oracle_msac_init(MsacContext *s, const uint8_t *data, size_t sz,
                             int disable_cdf_update) {
    dav1d_msac_init(s, data, sz, disable_cdf_update);
}

EXPORT unsigned oracle_msac_decode_symbol_adapt(MsacContext *s, uint16_t *cdf,
                                                size_t n_symbols) {
    return dav1d_msac_decode_symbol_adapt_c(s, cdf, n_symbols);
}

EXPORT unsigned oracle_msac_decode_bool_adapt(MsacContext *s, uint16_t *cdf) {
    return dav1d_msac_decode_bool_adapt_c(s, cdf);
}

EXPORT unsigned oracle_msac_decode_bool_equi(MsacContext *s) {
    return dav1d_msac_decode_bool_equi_c(s);
}

EXPORT unsigned oracle_msac_decode_bool(MsacContext *s, unsigned f) {
    return dav1d_msac_decode_bool_c(s, f);
}

EXPORT unsigned oracle_msac_decode_hi_tok(MsacContext *s, uint16_t *cdf) {
    return dav1d_msac_decode_hi_tok_c(s, cdf);
}

EXPORT int oracle_msac_decode_subexp(MsacContext *s, int ref, int n,
                                     unsigned k) {
    return dav1d_msac_decode_subexp(s, ref, n, k);
}

EXPORT int oracle_msac_cnt(MsacContext *s) { return s->cnt; }
EXPORT ptrdiff_t oracle_msac_pos(MsacContext *s, const uint8_t *base) {
    return s->buf_pos - base;
}
