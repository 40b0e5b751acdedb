#!/usr/bin/env bash
# SDK packaging ("3 - Prepare NRD SDK" analogue): collects the python wheel-style
# package, the C ABI header and the built native library into _SDK/.
set -euo pipefail
cd "$(dirname "$0")/.."

rm -rf _SDK
mkdir -p _SDK/include _SDK/lib _SDK/python

make -C native
cp native/include/nrdtpu_c.h _SDK/include/
cp native/build/libnrdtpu_c.so _SDK/lib/
cp -r nrdtpu _SDK/python/nrdtpu
cp pyproject.toml README.md _SDK/python/

echo "SDK prepared in _SDK/ (include/ lib/ python/)"
