"""Input-pipeline throughput: native C++ loader vs PIL thread pool.

Usage: python scripts/bench_loader.py <image_dir_or_zip> [dim] [threads]
Prints images/sec for both decode paths over one pass of the directory —
or, given a ``.zip`` archive, over its members via the in-memory decode
path (``lg_loader_load_buffers``: Python reads member bytes, the C++ pool
decodes without the GIL). The training step consumes 2*batch images per
step; at the measured v5e step rate (~3.6k images/s, bench.py) the loader
must sustain that to keep the chip fed.
"""

import sys
import time
from glob import glob
from os import path


def main() -> int:
    img_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lg_tpu_data/img"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    if img_dir.lower().endswith(".zip") and path.isfile(img_dir):
        return _bench_zip(img_dir, dim, threads)

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


def _bench_zip(zip_path: str, dim: int, threads: int) -> int:
    """Zip-archive path: per-batch member reads (thread-local handles mirror
    data/celeba.py's prefetch layout) + native in-memory decode, vs the same
    reads decoded by a PIL thread pool."""
    import zipfile

    from littlegan_tpu.data.celeba import _decode_pil
    from littlegan_tpu.data.native_loader import NativeBatchLoader

    with zipfile.ZipFile(zip_path) as z:
        names = sorted(
            n for n in z.namelist()
            if n.lower().endswith(".jpg") and not n.startswith("__MACOSX")
        )[:2048]
    if not names:
        print("no jpg members in", zip_path)
        return 1
    zf = zipfile.ZipFile(zip_path)

    native = NativeBatchLoader(dim, 3, threads=threads)
    native.load_buffers([zf.read(n) for n in names[:32]])  # warm
    t0 = time.perf_counter()
    for i in range(0, len(names), 64):
        native.load_buffers([zf.read(n) for n in names[i : i + 64]])
    dt = time.perf_counter() - t0
    print(f"zip -> native C++ ({threads} threads): {len(names)/dt:8.1f} images/s")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=threads) as pool:
        dec = lambda n: _decode_pil(zf.read(n), dim, 3)
        list(pool.map(dec, names[:64]))  # warm
        t0 = time.perf_counter()
        list(pool.map(dec, names))
        dt = time.perf_counter() - t0
    print(f"zip -> PIL pool   ({threads} threads): {len(names)/dt:8.1f} images/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
