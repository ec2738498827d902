#!/bin/bash
# Extract AV1 spec-constant tables from the reference into
# dav1d_mirror_tpu/data/spec_tables.npz (via gen_dumper.py + pack_tables.py).
set -e
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$HERE/.."
B="$REPO/oracle/build"
mkdir -p "$B/dump"

python "$HERE/gen_dumper.py"

CFLAGS="-O1 -w -std=c99 -D_GNU_SOURCE -DNDEBUG
 -include $REPO/oracle/config.h
 -I$REPO/oracle -I$B/include -I$REF -I$REF/include -I$REF/include/dav1d -I$REF/src"

gcc $CFLAGS "$REPO/oracle/dump_tables.c" \
    $REF/src/tables.c $REF/src/scan.c $REF/src/dequant_tables.c \
    $REF/src/qm.c $REF/src/ref.c $REF/src/mem.c $REF/src/log.c \
    $REF/src/data.c $REF/src/picture.c \
    -o "$B/dump/dump_tables" -lpthread -lm

(cd "$B/dump" && ./dump_tables)
python "$HERE/pack_tables.py" "$B/dump"
