#!/bin/sh
# Build the native data-loader core. Produces native/libsdt_dataio.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libsdt_dataio.so sdt_dataio.cpp -lz
echo "built $(pwd)/libsdt_dataio.so"
