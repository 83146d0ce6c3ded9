#!/bin/bash
# Build and run the stream fuzzer under ASAN+UBSAN.
# (counterpart of /root/reference/scripts/fuzz-libfuzzer.sh, using the
# standalone mutation driver since libFuzzer needs clang)
set -e
cd "$(dirname "$0")/.."
ITER=${1:-500}
g++ -std=c++17 -O1 -g -fsanitize=address,undefined -DTDE_FUZZ_MAIN \
    -Inative/include native/src/*.cc native/fuzz/stream_fuzzer.cc \
    -o /tmp/tde265_fuzz -pthread
/tmp/tde265_fuzz "$ITER" "${2:-/root/reference/testdata/girlshy.h265}" "${3:-777}"
