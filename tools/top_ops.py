"""Join trace op timings with HLO shapes + source metadata in one table.

Usage: python tools/top_ops.py <tracedir> <hlo.txt> [nsteps] [nops]
Prints: ms/step  op-name  result-shape  op_name-metadata (truncated).

nsteps defaults to the number of traced whole-program executions
(counted from the jit_* parent events) — passing it explicitly is only
needed for traces without a jit parent event. A wrong nsteps silently
scales every number, so prefer the auto-detection.
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_events(tracedir):
    paths = list(Path(tracedir).rglob("*.trace.json.gz"))
    assert paths, f"no trace in {tracedir}"
    ev = defaultdict(float)
    counts = defaultdict(int)
    for path in paths:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        # device op events: pid of /device:TPU planes
        pids = {
            p["pid"]
            for p in data.get("traceEvents", [])
            if p.get("ph") == "M"
            and p.get("name") == "process_name"
            and "TPU" in p.get("args", {}).get("name", "")
        }
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("pid") in pids:
                ev[e["name"]] += e.get("dur", 0) / 1e3
                counts[e["name"]] += 1
    # traced step count = executions of the whole-program parent event
    jit_counts = [c for n, c in counts.items() if n.startswith("jit_")]
    nsteps_auto = max(jit_counts) if jit_counts else None
    return ev, nsteps_auto


def load_hlo(hlopath):
    info = {}
    pat = re.compile(
        r"%([\w.-]+) = (\S+?)[({]"
    )
    meta = re.compile(r'op_name="([^"]*)"')
    for line in open(hlopath):
        m = pat.search(line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        mm = meta.search(line)
        info[name] = (shape, mm.group(1) if mm else "")
    return info


def main():
    tracedir, hlopath = sys.argv[1], sys.argv[2]
    nops = int(sys.argv[4]) if len(sys.argv) > 4 else 80
    ev, nsteps_auto = load_events(tracedir)
    nsteps = (
        int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] != "auto"
        else (nsteps_auto or 3)
    )
    print(f"(normalizing by nsteps={nsteps}"
          f"{' — auto-detected' if nsteps == nsteps_auto else ''})")
    info = load_hlo(hlopath)
    rows = sorted(ev.items(), key=lambda kv: -kv[1])
    total = 0.0
    shown = 0.0
    for name, ms in rows:
        if re.fullmatch(r"\d+", name) or name.startswith("jit_"):
            continue  # whole-step / parent-program events double-count
        total += ms / nsteps
    print(f"total device op time {total:.2f} ms/step")
    print(f"{'ms/step':>8}  {'op':<28} {'shape':<34} path")
    for name, ms in rows[: nops + 10]:
        if re.fullmatch(r"\d+", name) or name.startswith("jit_"):
            continue
        shape, path = info.get(name, ("?", "?"))
        per = ms / nsteps
        shown += per
        print(f"{per:8.3f}  {name:<28} {shape[:34]:<34} {path[:70]}")
        if shown and per < 0.08:
            break
    print(f"(shown {shown:.1f} of {total:.1f} ms/step)")


if __name__ == "__main__":
    main()
