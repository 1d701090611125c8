#!/bin/sh
# Build the native components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -fPIC -shared -o lib/libmmoe_jpeg.so \
    jpeg_loader/jpeg_loader.cpp -ljpeg -lpthread
echo "built native/lib/libmmoe_jpeg.so"
