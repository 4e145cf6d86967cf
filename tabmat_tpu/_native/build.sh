#!/bin/sh
# Build the native host helpers shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 \
    segment_helpers.cpp -o libtabmat_tpu_native.so
echo "built libtabmat_tpu_native.so"
