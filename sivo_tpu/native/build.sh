#!/bin/bash
# Build the native runtime library in-place.
set -e
cd "$(dirname "$0")"
mkdir -p build
cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build >/dev/null
cp build/libsivo_native.so .
echo "built $(pwd)/libsivo_native.so"
