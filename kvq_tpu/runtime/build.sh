#!/bin/sh
# Build the native host runtime (libkvq_runtime.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    kvq_runtime.cpp \
    -lopencv_core -lopencv_imgproc -lopencv_videoio -lpthread \
    -o libkvq_runtime.so
echo "built $(pwd)/libkvq_runtime.so"
