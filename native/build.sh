#!/bin/sh
# Build the native host-side library into zerocaf_tpu/_native/.
# Plain g++ fallback keeps the build dependency-free; cmake also works:
#   cmake -S native -B native/build -G Ninja && cmake --build native/build
set -e
cd "$(dirname "$0")"
mkdir -p ../zerocaf_tpu/_native
g++ -O3 -shared -fPIC -std=c++17 -o ../zerocaf_tpu/_native/libzerocaf_native.so recode.cpp
echo "built zerocaf_tpu/_native/libzerocaf_native.so"
