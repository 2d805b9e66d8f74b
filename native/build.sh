#!/bin/sh
# Build the native host-side library (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    gaussreg_native.cpp -o libgaussreg_native.so
echo "built $(pwd)/libgaussreg_native.so"
