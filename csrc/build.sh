#!/usr/bin/env bash
# Build the native data loader to build/libcnn_data.so.
set -euo pipefail
OUT=${1:-/root/repo/build}
mkdir -p "$OUT"
g++ -std=c++17 -O2 -fPIC -shared \
    $(pkg-config --cflags opencv4) \
    /root/repo/csrc/dataloader.cpp \
    -o "$OUT/libcnn_data.so" \
    $(pkg-config --libs opencv4) -lpthread
echo "built: $OUT/libcnn_data.so"
