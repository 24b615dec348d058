#!/bin/sh
# Build the native host runtime (libkvq_runtime.so).
#
# Atomic: compile to a process-unique temp name, then rename(2) into
# place — concurrent builders (pytest-xdist workers, bench + tests) each
# produce a complete .so and the last rename wins; no process can ever
# dlopen a partially-written file, and a failed compile leaves no
# corrupt artifact behind.
set -e
cd "$(dirname "$0")"
TMP="libkvq_runtime.so.tmp.$$"
trap 'rm -f "$TMP"' EXIT
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    kvq_runtime.cpp \
    -lopencv_core -lopencv_imgproc -lopencv_videoio -lpthread \
    -o "$TMP"
mv -f "$TMP" libkvq_runtime.so
echo "built $(pwd)/libkvq_runtime.so"
