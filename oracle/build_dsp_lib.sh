#!/bin/bash
# Build liboracle_dsp.so: the reference C DSP kernels wrapped for ctypes,
# used by tests as the golden reference (checkasm analogue).
set -e
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
B="$HERE/build"
mkdir -p "$B/obj_pic"

CFLAGS="-O2 -fPIC -w -std=c99 -D_GNU_SOURCE -DNDEBUG -fvisibility=hidden
 -include $HERE/config.h
 -I$HERE -I$B/include -I$REF -I$REF/include -I$REF/include/dav1d -I$REF/src"

SRCS_PLAIN="cdf.c cpu.c dequant_tables.c intra_edge.c itx_1d.c log.c mem.c
 msac.c pal.c qm.c ref.c scan.c tables.c wedge.c getbits.c data.c picture.c"
SRCS_TMPL="cdef_tmpl.c filmgrain_tmpl.c ipred_prepare_tmpl.c ipred_tmpl.c
 itx_tmpl.c loopfilter_tmpl.c looprestoration_tmpl.c mc_tmpl.c"

OBJS=""
for f in $SRCS_PLAIN; do
  o="$B/obj_pic/${f%.c}.o"
  [ -f "$o" ] || gcc $CFLAGS -c "$REF/src/$f" -o "$o"
  OBJS="$OBJS $o"
done
for f in $SRCS_TMPL; do
  for bd in 8 16; do
    o="$B/obj_pic/${f%.c}_${bd}.o"
    [ -f "$o" ] || gcc $CFLAGS -DBITDEPTH=$bd -c "$REF/src/$f" -o "$o"
    OBJS="$OBJS $o"
  done
done
for bd in 8 16; do
  o="$B/obj_pic/dsp_shim_${bd}.o"
  gcc $CFLAGS -DBITDEPTH=$bd -c "$HERE/dsp_shim_tmpl.c" -o "$o"
  OBJS="$OBJS $o"
done
gcc $CFLAGS -c "$HERE/shim_common.c" -o "$B/obj_pic/shim_common.o"
OBJS="$OBJS $B/obj_pic/shim_common.o"

gcc -shared $OBJS -o "$B/liboracle_dsp.so" -lm
echo "built $B/liboracle_dsp.so"
