#!/bin/sh
# Build the C interface shared library + its C test binary.
# Usage: sh csrc/build_capi.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
CFLAGS="$(python3-config --includes) -O2 -fPIC -Wall"
LDFLAGS="$(python3-config --ldflags) -lpython3.12"

g++ $CFLAGS -shared capi.cpp -o "$OUT/libpiqp_tpu_c.so" $LDFLAGS
gcc -O2 -Wall -I. test_capi.c -o "$OUT/test_capi" \
    -L"$OUT" -lpiqp_tpu_c -Wl,-rpath,"$(cd "$OUT" && pwd)"
echo "built $OUT/libpiqp_tpu_c.so and $OUT/test_capi"
