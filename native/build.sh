#!/bin/sh
# Build the native data-IO library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -pthread dataio.cpp -lz -o libbtio.so
echo "built native/libbtio.so"
