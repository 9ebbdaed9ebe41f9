"""Serving benchmark: latency + throughput of the AOT inference engine.

Measures the three serving entry points (generate / adjust / discriminate,
serving.py::InferenceEngine) and the cross-request dynamic batcher on
whatever accelerator JAX exposes. Emits one JSON line per measurement.

Measurement discipline (CLAUDE.md): this container reaches the chip over a
tunnel whose RTT swings 10-90 ms across the day, so

- *sustained throughput* is measured with an ASYNC dispatch pipeline
  (JAX dispatches are async; we only block at the end) — RTT-robust, the
  same rationale as bench.py's scan path;
- *single-call latency* is blocking wall time and therefore INCLUDES the
  tunnel RTT — tagged ``rtt_inclusive`` so nobody quotes it as device
  latency. On a local chip the same number IS the serving latency.

Usage: python scripts/serve_bench.py [--batch 32] [--dim 128] [--calls 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from littlegan_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from littlegan_tpu.config import Config  # noqa: E402
from littlegan_tpu.models import init_params  # noqa: E402
from littlegan_tpu.serving import DynamicBatcher, InferenceEngine, make_batchers  # noqa: E402


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit, **extra}), flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--calls", type=int, default=50)
    p.add_argument(
        "--reload", action="store_true",
        help="also run the checkpoint hot-reload-under-load drill",
    )
    p.add_argument("--threads", type=int, default=32)
    args = p.parse_args()

    cfg = Config(
        image_dim=args.dim,
        init_dim=args.dim // 16,
        compute_dtype="bfloat16",
        restore=False,
        debug=True,
    )
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} | batch {args.batch} | {args.dim}px", file=sys.stderr)
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(cfg, params=params, batch_size=args.batch)

    rng = np.random.default_rng(0)
    cond_b = rng.uniform(-1, 1, (args.batch, cfg.cond_dim)).astype(np.float32)
    noise_b = rng.normal(size=(args.batch, cfg.noise_dim)).astype(np.float32)
    img_b = rng.uniform(-1, 1, (args.batch, args.dim, args.dim, 3)).astype(np.float32)

    # ---- sustained generate throughput: K forwards per dispatch ----
    # One lax.scan dispatch covers K generator forwards, so the tunnel RTT
    # is amortized K-fold and the host fetch of the (K,) means forces real
    # completion (block_until_ready over this tunnel can resolve before the
    # device work does — a raw async-pipeline loop here measured 290k img/s,
    # 2.7x past the chip's bf16 peak; same trap as CLAUDE.md's wall-clock
    # rule). The scalar mean consumes every pixel, so nothing dead-codes.
    import jax.numpy as jnp

    from littlegan_tpu.models import generator_apply

    # Differential over two scan lengths cancels the per-dispatch constant
    # (RTT + host overhead): throughput = (K2-K1)*B / (t2 - t1).
    def k_gen(p, ns, cs):
        def body(_, nc):
            n, c = nc
            img = generator_apply(p, n, c, cfg)
            return 0, jnp.mean(img.astype(jnp.float32))

        _, means = jax.lax.scan(body, 0, (ns, cs))
        return means

    k_gen_jit = jax.jit(k_gen)

    def timed(k: int) -> float:
        ns = rng.normal(size=(k, args.batch, cfg.noise_dim)).astype(np.float32)
        cs = rng.uniform(-1, 1, (k, args.batch, cfg.cond_dim)).astype(np.float32)
        np.asarray(k_gen_jit(engine.params, ns, cs))  # warm/compile this K
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(k_gen_jit(engine.params, ns, cs))  # host fetch = sync
            best = min(best, time.perf_counter() - t0)
        return best

    k1 = max(8, args.calls // 8)
    k2 = max(2 * k1, args.calls)  # guarantee k2 > k1 for any --calls
    t1, t2 = timed(k1), timed(k2)
    dt = t2 - t1
    if dt <= 0:
        # best-of-3 does not guarantee monotonicity on a noisy tunnel; an
        # inverted differential is an INVALID measurement, not a huge number
        print(
            f"# INVALID differential: t({k1})={t1:.4f}s >= t({k2})={t2:.4f}s "
            "— tunnel noise swamped the device work; re-run with more --calls",
            file=sys.stderr,
        )
    else:
        emit(
            "serve_generate_sustained", (k2 - k1) * args.batch / dt, "images/sec",
            batch=args.batch, per_call_ms=round(1e3 * dt / (k2 - k1), 3),
        )

    # ---- blocking single-call latency (tunnel-RTT inclusive) ----
    for name, fn in (
        ("generate", lambda: engine.generate(cond_b[:1], noise=noise_b[:1])),
        ("adjust", lambda: engine.adjust(img_b[:1], cond_b[:1])),
        ("discriminate", lambda: engine.discriminate(img_b[:1])),
    ):
        fn()  # warm
        times = []
        for _ in range(max(10, args.calls // 2)):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        times.sort()
        emit(
            f"serve_{name}_latency_1", 1e3 * times[len(times) // 2], "ms_p50",
            p95_ms=round(1e3 * times[int(len(times) * 0.95)], 3),
            rtt_inclusive=True,
        )

    # ---- dynamic batcher: concurrent single-image requests ----
    batchers = make_batchers(engine, max_wait_ms=3.0)
    try:
        gen_b: DynamicBatcher = batchers["generate"]
        rounds = 4
        lat: list = []

        def worker(i: int):
            for _ in range(rounds):
                t0 = time.perf_counter()
                gen_b.submit(noise_b[i % args.batch], cond_b[i % args.batch])
                lat.append(time.perf_counter() - t0)

        # warm the batcher path
        gen_b.submit(noise_b[0], cond_b[0])
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(args.threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        lat.sort()
        emit(
            "serve_generate_batched_concurrent", args.threads * rounds / dt, "requests/sec",
            threads=args.threads,
            p50_ms=round(1e3 * lat[len(lat) // 2], 3),
            p95_ms=round(1e3 * lat[int(len(lat) * 0.95)], 3),
            rtt_inclusive=True,
        )
    finally:
        for b in batchers.values():
            b.close()

    if args.reload:
        reload_drill(args)
    return 0


def reload_drill(args) -> None:
    """Checkpoint hot-reload under load: sustained concurrent /generate
    traffic while ``maybe_reload`` swaps weights twice. Reports steady-state
    vs reload-window request latency and the reload apply time. The claim
    under test: a reload drops ZERO requests and the only cost is the
    host-side restore + one params H2D overlapping served traffic."""
    import tempfile

    from littlegan_tpu.serving import close_batchers
    from littlegan_tpu.training.checkpoint import Checkpointer

    tmp = tempfile.mkdtemp(prefix="lg_reload_")
    cfg = Config(
        image_dim=args.dim,
        init_dim=args.dim // 16,
        batch_size=args.batch,
        compute_dtype="bfloat16",
        debug=True,
        restore=True,
        exp_name="reload",
        all_result_dir=tmp,
        test_data_dir=os.path.join(tmp, "td"),
    )
    ck = Checkpointer(os.path.join(cfg.result_dir, "checkpoint"))
    ck.save("1", init_params(cfg, jax.random.PRNGKey(0)))
    engine = InferenceEngine(cfg, batch_size=8)
    batchers = make_batchers(engine, max_wait_ms=2.0)
    stop = threading.Event()
    lock = threading.Lock()
    samples: list = []  # (end_time, latency_s)
    errors: list = []

    def worker(i: int):
        rng = np.random.default_rng(i)
        noise = rng.normal(size=(cfg.noise_dim,)).astype(np.float32)
        cond = np.zeros((cfg.cond_dim,), np.float32)
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                batchers["generate"].submit(noise, cond)
            except Exception as e:  # noqa: BLE001 - the drill records, not raises
                errors.append(repr(e))
                return
            with lock:
                samples.append((time.perf_counter(), time.perf_counter() - t0))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    time.sleep(3.0)  # steady state
    windows = []
    apply_ms = []
    for k in (2, 3):
        ck.save(str(k), init_params(cfg, jax.random.PRNGKey(k)))
        t0 = time.perf_counter()
        tag = engine.maybe_reload()
        t1 = time.perf_counter()
        assert tag is not None, "reload drill: maybe_reload saw nothing new"
        apply_ms.append((t1 - t0) * 1e3)
        windows.append((t0, t1 + 0.5))  # blip can land on the NEXT dispatch
        time.sleep(3.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    close_batchers(batchers)

    in_window = [
        s for (end, s) in samples if any(w0 <= end <= w1 for (w0, w1) in windows)
    ]
    steady = sorted(
        s for (end, s) in samples if not any(w0 <= end <= w1 for (w0, w1) in windows)
    )
    in_window.sort()
    emit(
        "serve_generate_latency_during_hot_reload",
        1e3 * (in_window[len(in_window) // 2] if in_window else 0.0), "ms_p50",
        window_p99_ms=round(1e3 * in_window[int(len(in_window) * 0.99)], 3) if in_window else None,
        window_max_ms=round(1e3 * in_window[-1], 3) if in_window else None,
        steady_p50_ms=round(1e3 * steady[len(steady) // 2], 3),
        steady_p99_ms=round(1e3 * steady[int(len(steady) * 0.99)], 3),
        reload_apply_ms=[round(a, 1) for a in apply_ms],
        requests_total=len(samples),
        requests_in_reload_windows=len(in_window),
        errors=len(errors),
        rtt_inclusive=True,
    )
    assert not errors, errors


if __name__ == "__main__":
    sys.exit(main())
