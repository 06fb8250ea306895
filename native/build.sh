#!/bin/sh
# Build the native IO library into the package (see patchwork_tpu/io/native.py).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    patchwork_native.cpp -o ../patchwork_tpu/io/_patchwork_native.so
echo "built patchwork_tpu/io/_patchwork_native.so"
