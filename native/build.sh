#!/bin/bash
# Build the native frame loader (libframeloader.so -> monogs_tpu/data/).
# Falls back to a direct g++ invocation when cmake is unavailable.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null && command -v ninja >/dev/null; then
  cmake -B build -G Ninja >/dev/null
  cmake --build build >/dev/null
else
  g++ -O2 -fPIC -shared -pthread frame_loader.cpp -ljpeg -lpng \
      -o ../monogs_tpu/data/libframeloader.so
fi
echo "built monogs_tpu/data/libframeloader.so"
