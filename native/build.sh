#!/bin/sh
# Build the native host runtime (pupiloptixlab_tpu/native.py loads it,
# and also invokes this script lazily on first use).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libpupil_native.so pupil_native.cpp
echo "built $(pwd)/libpupil_native.so"
