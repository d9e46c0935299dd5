"""Aggregate device op time from a jax.profiler trace directory.

Usage: python tools/parse_trace.py /tmp/mofo_trace [top_n]
Prints device ops grouped by name (µs summed over all occurrences) and
a coarse grouping by op kind (fusion/custom-call/etc).
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mofo_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(root + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in (n or "")}
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    n_ev = 0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e["name"]
            dur = e.get("dur", 0.0)
            # skip the enclosing jit_* program spans (they contain the ops)
            if name.startswith("jit_"):
                by_cat["TOTAL program"] += dur
                continue
            n_ev += 1
            by_name[name] += dur
            args = e.get("args", {})
            cat = name.split(".")[0].split("(")[0]
            long = args.get("long_name", "") or args.get("hlo_op", "")
            if long:
                cat = cat + " | " + long.split("(")[0][:40]
            by_cat[cat] += dur
    print(f"{n_ev} device op events")
    print("--- by exact op name ---")
    for k, v in sorted(by_name.items(), key=lambda x: -x[1])[:top_n]:
        print(f"{v/1000:9.3f} ms  {k[:110]}")
    print("--- by category ---")
    for k, v in sorted(by_cat.items(), key=lambda x: -x[1])[:top_n]:
        print(f"{v/1000:9.3f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
