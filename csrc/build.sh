#!/usr/bin/env bash
# Build the native data loader to build/libcnn_data.so.
#   csrc/build.sh [out_dir] [--tsan]
# --tsan builds with ThreadSanitizer for race detection on the threaded
# batch engine (the reference has no sanitizer story, SURVEY.md §5.2).
set -euo pipefail
OUT=/root/repo/build
TSAN_FLAGS=""
for arg in "$@"; do
  if [ "$arg" = "--tsan" ]; then TSAN_FLAGS="-fsanitize=thread -g"; else OUT="$arg"; fi
done
mkdir -p "$OUT"
g++ -std=c++17 -O2 -fPIC -shared $TSAN_FLAGS \
    $(pkg-config --cflags opencv4) \
    /root/repo/csrc/dataloader.cpp \
    -o "$OUT/libcnn_data.so" \
    $(pkg-config --libs opencv4) -lpthread
echo "built: $OUT/libcnn_data.so ${TSAN_FLAGS:+(tsan)}"

# race-detection check (SURVEY.md §5.2 — absent in the reference):
#   csrc/build.sh /tmp/tsan --tsan
#   g++ -std=c++17 -O2 -fsanitize=thread -g csrc/tsan_stress.cpp \
#       -L/tmp/tsan -lcnn_data -Wl,-rpath,/tmp/tsan -o /tmp/tsan_stress
#   TSAN_OPTIONS=suppressions=csrc/tsan.supp /tmp/tsan_stress
# (clean as of round 1; suppression covers a GDAL-internal lock-order issue)
