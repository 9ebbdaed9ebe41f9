"""Summarize a JAX xplane trace: top TPU ops by self-time.

Usage: python scripts/xplane_top_ops.py <trace_dir_or_xplane.pb> [N]

Parses the raw xplane proto (tensorflow.tsl profiler proto, present in this
image) instead of tensorboard_plugin_profile, whose prebuilt converter is
incompatible with the installed TF. Aggregates XLA-op events on the TPU
device planes by event-metadata name and prints total/self time shares.
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    if not path.endswith(".pb"):
        hits = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
        if not hits:
            raise SystemExit(f"no *.xplane.pb under {path}")
        path = hits[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return path, xs


def main():
    path, xs = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lg_trace_r2")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    print(f"# {path}")
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        agg = collections.Counter()  # name -> total ps
        counts = collections.Counter()
        cat = {}
        total_ps = 0
        for line in plane.lines:
            if not line.name.startswith("XLA Ops"):
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                agg[name] += ev.duration_ps
                counts[name] += 1
                total_ps += ev.duration_ps
                for st in ev.stats:
                    sname = stat_meta[st.metadata_id].name
                    if sname == "category":
                        cat[name] = st.str_value or stat_meta[st.ref_value].name
        if not agg:
            continue
        print(f"\n== plane: {plane.name}  total XLA-op time {total_ps/1e9:.3f} ms")
        bycat = collections.Counter()
        for name, ps in agg.items():
            bycat[cat.get(name, "?")] += ps
        for c, ps in bycat.most_common():
            print(f"  [cat] {c:30s} {ps/1e9:9.3f} ms  {100*ps/total_ps:5.1f}%")
        print()
        for name, ps in agg.most_common(top_n):
            print(
                f"  {ps/1e9:9.3f} ms {100*ps/total_ps:5.1f}%  n={counts[name]:4d}  "
                f"[{cat.get(name,'?')}] {name[:110]}"
            )


if __name__ == "__main__":
    main()
