#!/bin/sh
# Build the native host-ops library. Called lazily by
# vibertgrid_tpu/data/native.py; safe to run manually.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libhost_ops.so host_ops.cpp
echo "built $(pwd)/libhost_ops.so"
