"""Isolation benchmark: Pallas boundary conv vs XLA, real-chip (round-3).

Times the narrow-channel s2d boundary 3x3 conv family at the exact train-
step shapes (xplane: XLA runs these at ~3-7% MFU via an N-minor layout)
against littlegan_tpu.ops.pallas.boundary_conv's im2col MXU GEMM kernel.

CAVEAT (measured 2026-08-17): isolation wall-clock over this container's
host<->chip tunnel is unreliable in BOTH directions — isolated XLA convs
run 2-5x slower than their own in-step fusions (different layout choices),
and sub-100us kernels disappear into dispatch noise. The step-level bench
(bench.py with Config.use_pallas_boundary) is the decision metric; its
verdict is in ops/pallas/boundary_conv.py's docstring (XLA wins).

Run on the chip: PYTHONPATH=/root/repo python scripts/bench_boundary_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from littlegan_tpu.ops.pallas.boundary_conv import conv3x3_same_stats, _xla_conv3x3
from littlegan_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

SHAPES = [  # (N, H, W, Cin, Cout, with_stats, label)
    (64, 64, 64, 12, 64, True, "enc-conv1 adj batch (fusion.1511/1508 class)"),
    (32, 64, 64, 12, 64, True, "enc-conv1 G/D batch"),
    (64, 64, 64, 128, 12, False, "out_conv adj batch (128->12)"),
    (32, 64, 64, 128, 12, False, "out_conv G batch"),
]

ITERS = 30


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    for n, h, w, cin, cout, stats, label in SHAPES:
        x = jnp.asarray(rng.normal(size=(n, h, w, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)

        def xla_fused(x, wt):
            y = _xla_conv3x3(x, wt)
            if stats:
                return y.astype(jnp.bfloat16), y.sum(axis=(1, 2, 3)), (y * y).sum(axis=(1, 2, 3))
            return (y.astype(jnp.bfloat16),)

        bias = jnp.zeros((cout,), jnp.bfloat16)
        xla_t = timeit(jax.jit(xla_fused), x, wt)
        if cin > 16:
            print(f"{label:48s} XLA {xla_t*1e6:8.1f}us | Pallas n/a (cin > CPAD)")
            continue
        pal_t = timeit(
            jax.jit(lambda x, wt: conv3x3_same_stats(x, wt, bias, with_stats=stats)), x, wt
        )
        flops = 2 * n * h * w * 9 * cin * cout
        print(
            f"{label:48s} XLA {xla_t*1e6:8.1f}us ({flops/xla_t/1e12:5.1f} TF/s) | "
            f"Pallas {pal_t*1e6:8.1f}us ({flops/pal_t/1e12:5.1f} TF/s) | "
            f"speedup {xla_t/pal_t:5.2f}x"
        )


if __name__ == "__main__":
    main()
