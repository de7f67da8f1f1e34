#!/bin/bash
# Build the native host kernels (.so loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -shared -fPIC -std=c++17 -o libkitti_native.so kitti_native.cpp
echo "built $(pwd)/libkitti_native.so"
