#!/bin/sh
# Build the native frame loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    frameloader.cpp -o libframeloader.so -lpng -ljpeg -lpthread
echo "built native/libframeloader.so"
