#!/bin/bash
# AddressSanitizer gate for the native runtime (entropy parser, demuxers,
# export writers) — the reference's valgrind-memcheck workflow equivalent
# (PROFILING.md:16-48).  Builds an instrumented .so and runs every
# native-touching test against it; any heap/stack OOB or UAF aborts.
#
# Usage: bash tools/asan_check.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."

ASAN_SO=/tmp/libminivideo_native_asan.so
echo "== building ASan-instrumented native lib"
g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -fPIC -std=c++17 \
    -pthread -shared -o "$ASAN_SO" \
    minivideo_tpu/native/src/entropy.cc \
    minivideo_tpu/native/src/demux.cc \
    minivideo_tpu/native/src/export.cc -lz

LIBASAN=$(g++ -print-file-name=libasan.so)
echo "== exercising the native lib under ASan ($LIBASAN)"
# tools/asan_exercise.py drives every native entry point over valid and
# mutated inputs WITHOUT importing jax (jaxlib is not ASan-clean under
# LD_PRELOAD).  Leak detection off: the interpreter holds allocations
# at exit by design; we are after OOB/UAF in the lib.
LD_PRELOAD="$LIBASAN" \
ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
MINIVIDEO_TPU_NATIVE_LIB="$ASAN_SO" \
python tools/asan_exercise.py "${1:-6}"

echo "asan: OK"
