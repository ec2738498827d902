#!/bin/sh
# Build the native host components -> libdav1d_host.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -fvisibility=hidden \
    -o libdav1d_host.so msac.cpp ipred.cpp tilecoder.cpp recon.cpp lf.cpp
echo "built $(pwd)/libdav1d_host.so"
