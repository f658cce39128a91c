#!/usr/bin/env bash
# Out-of-tree build of the reference library sources (read-only at
# /root/reference) + our oracle mains. Mirrors the reference's own target
# layout (cpu/CMakeLists.txt:27-55) without touching its files.
set -euo pipefail

REF=/root/reference/cpu
OUT=${1:-/root/repo/build/reference_oracle}
mkdir -p "$OUT"

CXXFLAGS="-std=c++17 -O2 -I$REF/include $(pkg-config --cflags opencv4)"
LDFLAGS="$(pkg-config --libs opencv4)"

LIB_SRC="$REF/src/data_format.cpp $REF/src/architectures.cpp $REF/src/func.cpp \
         $REF/src/metrics.cpp $REF/src/pipeline.cpp $REF/src/relu.cpp \
         $REF/src/linear.cpp $REF/src/conv2d.cpp $REF/src/pool2d.cpp \
         $REF/src/batchnorm2d.cpp $REF/src/dropout.cpp $REF/src/alexnet.cpp"

g++ $CXXFLAGS /root/repo/tools/reference_oracle/fixture_gen.cpp $LIB_SRC -o "$OUT/fixture_gen" $LDFLAGS
g++ $CXXFLAGS /root/repo/tools/reference_oracle/baseline_bench.cpp $LIB_SRC -o "$OUT/baseline_bench" $LDFLAGS
echo "built: $OUT/{fixture_gen,baseline_bench}"
g++ $CXXFLAGS /root/repo/tools/reference_oracle/layer_dump.cpp $LIB_SRC -o "$OUT/layer_dump" $LDFLAGS
echo "built: $OUT/layer_dump"
g++ $CXXFLAGS /root/repo/tools/reference_oracle/grad_dump.cpp $LIB_SRC -o "$OUT/grad_dump" $LDFLAGS
echo "built: $OUT/grad_dump"
g++ $CXXFLAGS /root/repo/tools/reference_oracle/run_model.cpp $LIB_SRC -o "$OUT/run_model" $LDFLAGS
echo "built: $OUT/run_model"
