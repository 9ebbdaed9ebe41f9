#!/usr/bin/env bash
# Build the native data loader (libjpeg decode + worker pool) into the
# package so ctypes can find it. Idempotent; safe to re-run.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p littlegan_tpu/data/_native
# build to a temp name + atomic rename: a concurrent process auto-building
# or dlopen-ing must never see a partially written .so
tmp="littlegan_tpu/data/_native/.libloader.$$.so"
trap 'rm -f "$tmp"' EXIT
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    native/loader.cc -o "$tmp" -ljpeg -lpthread
mv -f "$tmp" littlegan_tpu/data/_native/libloader.so
echo "built littlegan_tpu/data/_native/libloader.so"
