#!/bin/bash
# Debug oracle: DEBUG_BLOCK_INFO=1 build for entropy trace comparison.
#
# The two debug-enabled sources are generated at build time by patching the
# reference files with sed (no reference code is checked into this repo):
#   recon.h       — DEBUG_BLOCK_INFO gate forced to 1
#   recon_tmpl.c  — per-coefficient trace gate `&& plane && 0` removed
set -e
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
B="$HERE/build"
mkdir -p "$B/obj_dbg" "$B/dbg_gen/src"

# generate patched debug sources from the reference
sed -e 's/#define DEBUG_BLOCK_INFO 0 && \\/#define DEBUG_BLOCK_INFO 1 \&\& \\/' \
    -e 's/f->frame_hdr->frame_offset == 2 && t->by >= 0 && t->by < 4 && \\/1 \&\& \\/' \
    -e 's/t->bx >= 8 && t->bx < 12/1/' \
    "$REF/src/recon.h" > "$B/dbg_gen/src/recon.h"
sed -e 's/const int dbg = DEBUG_BLOCK_INFO && plane && 0;/const int dbg = DEBUG_BLOCK_INFO;/' \
    "$REF/src/recon_tmpl.c" > "$B/dbg_gen/recon_tmpl_dbg.c"

CFLAGS="-O1 -g0 -w -std=c99 -D_GNU_SOURCE -DNDEBUG
 -include $HERE/config.h
 -I$B/dbg_gen -I$HERE -I$B/include -I$REF -I$REF/include -I$REF/include/dav1d -I$REF/src
 -I$REF/tools"
SRCS_PLAIN="cdf.c cpu.c data.c dequant_tables.c getbits.c intra_edge.c
 itx_1d.c lf_mask.c lib.c log.c mem.c msac.c obu.c pal.c picture.c qm.c
 ref.c refmvs.c scan.c tables.c thread_task.c warpmv.c wedge.c decode.c"
SRCS_TMPL="cdef_apply_tmpl.c cdef_tmpl.c fg_apply_tmpl.c filmgrain_tmpl.c
 ipred_prepare_tmpl.c ipred_tmpl.c itx_tmpl.c lf_apply_tmpl.c
 loopfilter_tmpl.c looprestoration_tmpl.c lr_apply_tmpl.c mc_tmpl.c
 recon_tmpl.c"
OBJS=""
for f in $SRCS_PLAIN; do
  o="$B/obj_dbg/${f%.c}.o"
  [ -f "$o" ] || gcc $CFLAGS -c "$REF/src/$f" -o "$o"
  OBJS="$OBJS $o"
done
for f in $SRCS_TMPL; do
  for bd in 8 16; do
    o="$B/obj_dbg/${f%.c}_${bd}.o"
    [ -f "$o" ] || gcc $CFLAGS -DBITDEPTH=$bd -c "$REF/src/$f" -o "$o"
    OBJS="$OBJS $o"
  done
done
TOOLS="$REF/tools/dav1d.c $REF/tools/dav1d_cli_parse.c
 $REF/tools/input/input.c $REF/tools/input/ivf.c $REF/tools/input/annexb.c
 $REF/tools/input/section5.c
 $REF/tools/output/output.c $REF/tools/output/md5.c $REF/tools/output/null.c
 $REF/tools/output/y4m2.c $REF/tools/output/yuv.c"
gcc $CFLAGS $TOOLS $OBJS -o "$B/dav1d_dbg" -lpthread -lm -ldl
echo built "$B/dav1d_dbg"

# rebuild recon_tmpl with per-symbol coef traces
for bd in 8 16; do
  gcc $CFLAGS -DBITDEPTH=$bd -c "$B/dbg_gen/recon_tmpl_dbg.c" -o "$B/obj_dbg/recon_tmpl_${bd}.o"
done
gcc $CFLAGS $TOOLS $OBJS -o "$B/dav1d_dbg" -lpthread -lm -ldl
echo rebuilt with coef traces
