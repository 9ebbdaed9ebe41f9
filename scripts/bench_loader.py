"""Input-pipeline throughput: native C++ loader vs PIL thread pool.

Usage: python scripts/bench_loader.py <image_dir> [dim] [threads]
Prints images/sec for both decode paths over one pass of the directory.
The training step consumes 2*batch images per step; at the measured v5e
step rate (~3.6k images/s, bench.py) the loader must sustain that to keep
the chip fed.
"""

import sys
import time
from glob import glob
from os import path


def main() -> int:
    img_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lg_tpu_data/img"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    files = sorted(glob(path.join(img_dir, "*.jpg")))[:2048]
    if not files:
        print("no jpgs in", img_dir)
        return 1

    from littlegan_tpu.data.native_loader import NativeBatchLoader

    native = NativeBatchLoader(dim, 3, threads=threads)
    native.load(files[:32])  # warm
    t0 = time.perf_counter()
    for i in range(0, len(files), 64):
        native.load(files[i : i + 64])
    dt = time.perf_counter() - t0
    print(f"native C++ ({threads} threads): {len(files)/dt:8.1f} images/s")

    from concurrent.futures import ThreadPoolExecutor

    from littlegan_tpu.data.celeba import _decode_pil

    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(lambda p: _decode_pil(p, dim, 3), files[:64]))  # warm
        t0 = time.perf_counter()
        list(pool.map(lambda p: _decode_pil(p, dim, 3), files))
        dt = time.perf_counter() - t0
    print(f"PIL pool   ({threads} threads): {len(files)/dt:8.1f} images/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
