#!/usr/bin/env bash
# Build the native data loader (libjpeg decode + worker pool) into the
# package so ctypes can find it. Idempotent; safe to re-run.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p littlegan_tpu/data/_native
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    native/loader.cc -o littlegan_tpu/data/_native/libloader.so -ljpeg -lpthread
echo "built littlegan_tpu/data/_native/libloader.so"
