#!/bin/sh
# Build the native host-side kernels -> kmbart_tpu/_native/kmbart_native.so
set -e
cd "$(dirname "$0")"
mkdir -p ../kmbart_tpu/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    kmbart_native.cpp -o ../kmbart_tpu/_native/kmbart_native.so
echo "built ../kmbart_tpu/_native/kmbart_native.so"
