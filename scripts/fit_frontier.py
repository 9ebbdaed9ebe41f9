"""Chip-accurate "what fits on one chip" frontier, WITHOUT burning step time.

On the tunneled TPU backend XLA compiles ahead-of-time (chiplessly), so a
config past HBM capacity fails at COMPILE time with the backend's own
"Ran out of memory in memory space hbm. Used X of Y" diagnosis. This script
probes a grid of (dim, batch) x flag-set points by running
scripts/memory_report.py --compile in a SUBPROCESS per point (a compile OOM
must not poison later probes, and a tunnel hang must time out, not wedge
the sweep), parses the JSON verdict plus the stderr OOM detail, and prints
one JSON line per probe + a final table.

The verdict is for the SINGLE train step (donated, production semantics).
The production scan pipeline adds the `device_data` uint8 store on top —
the table includes an `n_images_headroom` column: how many store images fit
in the HBM left over after the step's peak (0 when the step alone OOMs).

Usage:
  python scripts/fit_frontier.py --points 1024:16,1024:32,2048:4 \
      --flagsets parity,remat,remat+adjhalf [--out artifacts/fit_v5e.json]
  python scripts/fit_frontier.py --search 1024 --flagsets remat  # max batch
  python scripts/fit_frontier.py --search 2048 --topology v5e:2x4 \
      --mesh data=4,model=2 --flagsets remat+zero+sdense+mbf16   # 8-chip AOT

Flags inside a flag-set (joined with '+'): parity (none), remat, adjhalf,
mbf16, ema, zero (shard_opt_state), sdense (shard_dense), accumM (probe the
gradient-accumulation step: M micro-pairs of `batch` rows per applied
update — ONE micro-pair's activations live, effective batch M x batch).

--topology compiles the MULTI-chip production step (DP, or the spatial
('data','model') step when --mesh has a 'model' axis) for a TPU topology
description — per-chip fit verdicts for a slice this host doesn't have.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OOM_RE = re.compile(r"Ran out of memory in memory space hbm\. Used ([0-9.]+)([MG]) of ([0-9.]+)([MG])")
_SCALE = {"M": 1 << 20, "G": 1 << 30}

FLAG_ARGS = {
    "parity": [],
    "remat": ["--remat"],
    "adjhalf": ["--adj-half"],
    "mbf16": ["--moment-dtype", "bfloat16"],
    "ema": ["--ema", "0.999"],
    "zero": ["--shard-opt-state"],
    "sdense": ["--shard-dense"],
}


def flagset_args(flagset: str) -> list[str]:
    args: list[str] = []
    for f in flagset.split("+"):
        m = re.fullmatch(r"accum(\d+)", f)  # accumM: M micro-pairs per update
        if m:
            args += ["--grad-accum", m.group(1)]
            continue
        if f not in FLAG_ARGS:
            raise SystemExit(
                f"unknown flag '{f}' (know: {sorted(FLAG_ARGS)} + 'accumM')")
        args += FLAG_ARGS[f]
    return args


def probe(
    dim: int, batch: int, flagset: str, timeout_s: int,
    topology: str | None = None, mesh: str | None = None,
) -> dict:
    """One compile-only probe in a fresh subprocess; returns the verdict."""
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "memory_report.py"),
        "--dim", str(dim), "--batch", str(batch), "--compile",
        *flagset_args(flagset),
    ]
    if topology:
        cmd += ["--topology", topology]
    if mesh:
        cmd += ["--mesh", mesh]
    point = {"dim": dim, "batch": batch, "flags": flagset,
             **({"topology": topology, "mesh": mesh} if topology else {})}
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {**point, "verdict": "timeout",
                "note": f"probe exceeded {timeout_s}s (tunnel hang or huge compile)"}
    # memory_report prints the machine-readable JSON as its last stdout line
    rep = None
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("{"):
            rep = json.loads(line)
            break
    if rep is None or "compiled" not in rep:
        return {**point, "verdict": "error", "exit": r.returncode,
                "stderr_tail": r.stderr[-400:]}
    comp = rep["compiled"]
    out = {**point, "backend": comp.get("backend"),
           "n_chips": comp.get("n_chips", 1),
           "state_bytes": rep.get("total_per_chip_bytes")}
    if comp["fits"]:
        out["verdict"] = "fits"
        out["peak_bytes"] = comp["peak_bytes"]
    else:
        out["verdict"] = "oom"
        used = comp.get("oom_used_bytes")
        cap = comp.get("hbm_capacity_bytes")
        if used is None:  # detail rides the plugin's stderr tracing
            m = _OOM_RE.search(r.stderr)
            if m:
                used = int(float(m.group(1)) * _SCALE[m.group(2)])
                cap = int(float(m.group(3)) * _SCALE[m.group(4)])
        if used is not None:
            out["peak_bytes"] = used
            out["hbm_capacity_bytes"] = cap
        else:
            # no "Used X of Y" anywhere: the compile failed for some OTHER
            # reason (helper crash, serialization limit, …) — surface the
            # error text instead of letting it masquerade as a plain OOM
            out["verdict"] = "compile_error"
            out["compile_error"] = comp.get("compile_error")
    return out


def headroom_images(res: dict, dim: int, hbm_bytes: int) -> int | None:
    """How many uint8 store images fit next to the step's peak (device_data
    budgeting); None when the probe gave no peak.

    Multi-chip: ``peak_bytes`` is per chip, and the sharded store spreads
    every image's bytes evenly over the slice (rows over 'data'; rows AND
    H-slabs under spatial), so capacity = per-chip free x n_chips."""
    peak = res.get("peak_bytes")
    if peak is None:
        return None
    per_image = dim * dim * 3  # uint8 HWC
    return max(0, (hbm_bytes - peak) * res.get("n_chips", 1) // per_image)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument(
        "--points", default=None,
        help="comma list of dim:batch probes, e.g. '1024:16,1024:32,2048:4'",
    )
    p.add_argument(
        "--search", type=int, default=None, metavar="DIM",
        help="binary-search the largest fitting batch at DIM "
        "(probes are compiles — minutes each at 1024²+)",
    )
    p.add_argument("--max-batch", type=int, default=64, help="--search upper bound")
    p.add_argument(
        "--flagsets", default="parity,remat",
        help="comma list of '+'-joined flag sets per point "
        f"(flags: {sorted(FLAG_ARGS)})",
    )
    p.add_argument("--timeout", type=int, default=1500, help="seconds per probe")
    p.add_argument(
        "--topology", default=None, metavar="NAME",
        help="probe the MULTI-chip production step AOT-compiled for a TPU "
        "topology description (e.g. 'v5e:2x4') — per-chip verdicts for a "
        "slice this host doesn't have; pairs with --mesh",
    )
    p.add_argument(
        "--mesh", default=None, metavar="SPEC",
        help="axis split for --topology, e.g. 'data=8' or 'data=4,model=2' "
        "(a 'model' axis selects the spatial step)",
    )
    p.add_argument(
        "--hbm-gib", type=float, default=15.75,
        help="usable HBM for the store-headroom column (v5e: 15.75)",
    )
    p.add_argument("--out", default=None, help="also write results JSON here")
    args = p.parse_args()
    if not args.points and args.search is None:
        p.error("need --points or --search")

    hbm = int(args.hbm_gib * (1 << 30))
    flagsets = [f.strip() for f in args.flagsets.split(",") if f.strip()]
    for fs in flagsets:
        flagset_args(fs)  # validate before burning compile time
    results: list[dict] = []

    def record(res: dict) -> None:
        res["n_images_headroom"] = headroom_images(res, res["dim"], hbm)
        results.append(res)
        print(json.dumps(res), flush=True)

    if args.points:
        for part in args.points.split(","):
            d, b = part.strip().split(":")
            for fs in flagsets:
                record(probe(int(d), int(b), fs, args.timeout,
                             args.topology, args.mesh))

    if args.search is not None:
        for fs in flagsets:
            lo, hi = 0, args.max_batch  # invariant: lo fits (0 = vacuous), hi+1 unknown
            # first check the upper bound — if it fits, no search needed
            top = probe(args.search, args.max_batch, fs, args.timeout,
                        args.topology, args.mesh)
            record(top)
            if top["verdict"] == "fits":
                lo = args.max_batch
            else:
                hi = args.max_batch - 1
                while lo < hi:
                    mid = (lo + hi + 1) // 2
                    res = probe(args.search, mid, fs, args.timeout,
                                args.topology, args.mesh)
                    record(res)
                    if res["verdict"] == "fits":
                        lo = mid
                    elif res["verdict"] == "oom":
                        hi = mid - 1
                    else:  # timeout/error: treat as non-fit but keep going
                        hi = mid - 1
            print(json.dumps({"dim": args.search, "flags": fs,
                              "max_fitting_batch": lo}), flush=True)
            results.append({"dim": args.search, "flags": fs,
                            "max_fitting_batch": lo})

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"hbm_bytes": hbm, "results": results}, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
