#!/bin/bash
# Build the native host runtime (replaces the reference's build.sh role
# for the C++ side; the TPU compute path needs no build).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    orbslam_host.cpp -o liborbslam_host.so
echo "built native/liborbslam_host.so"
