#!/bin/sh
# Build the native asset library (ctypes-loaded; see native/assetlib.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffp-contract=off -fPIC -shared -o libassetlib.so assetlib.cpp
echo "built native/libassetlib.so"
