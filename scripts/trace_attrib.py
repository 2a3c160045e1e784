"""Attribute device time from a jax.profiler vm.trace.json.gz directly.

The tensorboard op-stats converter is broken in this image (protobuf
mismatch); the trace-viewer JSON the axon runtime writes has everything
needed: per-event `dur` (us), `tf_op`, `long_name`, `source`. Groups device
events by a coarse category and by tf_op, prints the top entries.

usage: python scripts/trace_attrib.py <trace_dir_or_json.gz> [top_n]
"""

import gzip
import json
import glob
import os
import re
import sys
from collections import defaultdict


def load_events(path):
    if os.path.isdir(path):
        hits = glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
        if not hits:
            raise SystemExit(f"no trace.json.gz under {path}")
        path = hits[0]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events = load_events(path)

    # device-track PIDs: process_name metadata containing "TPU" / "/device"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items() if re.search(r"TPU|/device|XLA", n, re.I)
    }

    rows = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        args = e.get("args", {}) or {}
        rows.append((e.get("name", "?"), float(e["dur"]), args))
    if not rows:  # fallback: no recognizable device pids — take all complete events
        rows = [
            (e.get("name", "?"), float(e["dur"]), e.get("args", {}) or {})
            for e in events
            if e.get("ph") == "X" and "dur" in e
        ]

    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    by_src = defaultdict(float)
    big = defaultdict(float)  # individual fusions, un-merged (name + shape)
    total = 0.0
    for name, dur, args in rows:
        total += dur
        key = args.get("tf_op") or name
        # strip fusion suffixes: "fusion.1234" -> "fusion"
        short = re.sub(r"[.\d]+$", "", name)
        by_op[key] += dur
        by_cat[short] += dur
        src = args.get("source") or ""
        if src:
            by_src[src] += dur
        ln = args.get("long_name") or ""
        shape = ln.split(" ", 1)[0] if ln else ""
        big[f"{name} {shape} @{src}"] += dur

    print(f"total device-event time: {total/1e3:.2f} ms over {len(rows)} events")
    print("\n== by event name (coarse) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n== by tf_op ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  {k[:140]}")
    print("\n== by source line ==")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  {k[:140]}")
    print("\n== top individual ops (name+shape+src) ==")
    for k, v in sorted(big.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  {k[:170]}")


if __name__ == "__main__":
    main()
