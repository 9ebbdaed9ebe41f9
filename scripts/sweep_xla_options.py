"""Sweep per-jit XLA compiler options over the production scan train step.

Round-3 continuation of the scoped-VMEM sweep (Config.scoped_vmem_kib):
every other single-chip lever in ROADMAP #3/#6 is measured-dead, so the
remaining untried knob space is the TPU backend's own pass options, which
DO reach the tunneled backend when passed per-jit (unlike XLA_FLAGS —
CLAUDE.md "hard-won rules").

Protocol (same as bench.py — the only trusted harness over the tunnel):
the K=8-step lax.scan dispatch at reference scale (128², b32, bf16),
2 warm-up + 5 measured dispatches per candidate, baseline re-measured
FIRST and LAST so tunnel/day drift is visible in the output. Candidates
whose option names the backend rejects are reported as `rejected` (the
per-jit API errors at compile time on unknown names) — that is data, not
failure: it pins which knobs this toolchain exposes.

Usage (real chip):  python scripts/sweep_xla_options.py
Output: one JSON line per candidate {name, options, step_ms | rejected}.

MEASURED (v5e, 2026-08-17; baseline repeated first/last read 10.45/10.79 ms
— that 0.34 ms spread is the tunnel's noise floor, so only deltas beyond it
count): scoped-VMEM re-confirmed monotone above 32 MiB (24M 10.55, 49M
10.80, 65M 11.00, 98M 11.35); `xla_tpu_dot_dot_fusion_duplicated` REGRESSES
hard (14.97); `..._exhaustive_output_fusion` and `..._async_host_dma` crash
tpu_compile_helper (exit 1 — same failure class as the Mosaic concat crash,
ROADMAP #6); everything else (licm-8, mbl-opt, rwb-off, nested-dot,
aggressive-bcast, vmem-dmas) lands 10.39-10.88. A 3x alternating A/B of the
two near-winners (nested-dot, licm-8, their combo) vs baseline puts all
medians within 0.03 ms of 10.50 — noise. CONCLUSION: no per-jit option
beats the shipped default (32 MiB scoped VMEM alone); the 10.4-10.5 ms b32
plateau stands from the compiler-flag side too.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from littlegan_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax

from bench import build_scan_harness, time_scan_dispatches  # shared harness
from littlegan_tpu.config import Config

K = 8
WARMUP = 2
MEASURE = 5
N_STORE = 16

# Each entry merges OVER the production default (scoped vmem 32 MiB).
# Names are candidates — the backend arbitrates which exist.
CANDIDATES: list[tuple[str, dict[str, str]]] = [
    ("baseline-32M", {}),
    ("vmem-24M", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem-49M", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem-65M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem-98M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("licm-8", {"xla_tpu_licm_size_inflation_ratio": "8"}),
    ("mbl-opt", {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}),
    ("rwb-off", {"xla_tpu_rwb_fusion": "false"}),
    ("dot-dot-dup", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
    ("nested-dot", {"xla_tpu_nested_dot_fusion": "true"}),
    (
        "exhaustive-out-fusion",
        {"xla_tpu_enable_experimental_exhaustive_output_fusion": "true"},
    ),
    ("aggressive-bcast", {"xla_tpu_enable_aggressive_broadcast_priority_update": "true"}),
    ("vmem-dmas", {"xla_tpu_enable_vmem_to_vmem_dmas": "true"}),
    ("async-host-dma", {"xla_tpu_enable_async_host_dma": "true"}),
    ("baseline-again", {}),  # drift control
]


def time_candidate(name: str, extra: dict[str, str]) -> dict:
    cfg = Config(
        batch_size=32,
        compute_dtype="bfloat16",
        use_partition=True,
        train_adj=True,
        donate_state=True,
        debug=True,
        xla_options=dict(extra),
    )
    # bench.py's exact production harness (shared code, not a copy) with
    # COMPILE separated from MEASUREMENT: only a compile-time failure means
    # "the backend rejects this option"; a runtime failure during the timed
    # dispatches (tunnel hiccup, OOM) is reported as `error`, not rejection.
    try:
        state, dispatch = build_scan_harness(cfg, K, N_STORE)
        state = dispatch(state, 0)  # first dispatch compiles
        jax.block_until_ready(state.params)
    except Exception as e:
        return {"name": name, "options": extra, "rejected": str(e).split("\n")[0][:200]}
    try:
        step_s, _ = time_scan_dispatches(
            state, dispatch, k=K, warmup=WARMUP - 1, measure=MEASURE, start=1
        )
    except Exception as e:
        return {"name": name, "options": extra, "error": str(e).split("\n")[0][:200]}
    return {"name": name, "options": extra, "step_ms": round(step_s * 1000, 3)}


def main():
    results = []
    for name, extra in CANDIDATES:
        r = time_candidate(name, extra)
        print(json.dumps(r), flush=True)
        results.append(r)
    timed = [r for r in results if "step_ms" in r]
    if timed:
        best = min(timed, key=lambda r: r["step_ms"])
        print(json.dumps({"best": best["name"], "step_ms": best["step_ms"]}))


if __name__ == "__main__":
    main()
