#!/bin/bash
# ABI drop-in test: compile the reference's dec265.cc UNMODIFIED against
# tde265's headers + libtde265.so, then decode girlshy.h265 with SEI hash
# checking and verify the output YUV md5 oracle (reference ci-run.sh:96-102).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REF:-/root/reference}"
BUILD="$REPO/build"
OUT="${TMPDIR:-/tmp}/tde265_dropin"
mkdir -p "$OUT"

test -f "$REF/dec265/dec265.cc" || { echo "SKIP: no reference checkout"; exit 77; }
test -f "$BUILD/libtde265.so" || { echo "SKIP: build libtde265.so first"; exit 77; }

g++ -O1 -o "$OUT/dec265" "$REF/dec265/dec265.cc" \
    -I"$REPO/native/include/tde265" -I"$REPO/native/compat" \
    -L"$BUILD" -ltde265

export LD_LIBRARY_PATH="$BUILD"
"$OUT/dec265" -q -c "$REF/testdata/girlshy.h265"
"$OUT/dec265" -q -o "$OUT/girlshy.yuv" "$REF/testdata/girlshy.h265" >/dev/null

md5=$(md5sum "$OUT/girlshy.yuv" | cut -d' ' -f1)
if [ "$md5" != "b81538fa33a67278e5263e231e43ca98" ]; then
  echo "FAIL: drop-in dec265 YUV md5 $md5 != oracle"
  exit 1
fi
echo "OK: reference dec265.cc drop-in build decodes girlshy bit-exactly"
