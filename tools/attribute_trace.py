"""Join a jax.profiler device trace with the optimized HLO's metadata to
attribute device time to model components.

Usage:
  python tools/dump_hlo.py /tmp/step_hlo.txt      # same config as bench
  python tools/profile_step.py /tmp/mofo_trace
  python tools/attribute_trace.py /tmp/mofo_trace /tmp/step_hlo.txt [n_steps]

Buckets by op_name metadata (jvp(...)/transpose(...) paths): encoder
blocks, decoder blocks, attention custom-calls, patchify/targets,
optimizer, masking, loss, other.
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def hlo_metadata(path):
    """op name -> op_name metadata string."""
    meta = {}
    pat = re.compile(r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\"")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                meta[m.group(1)] = m.group(2)
    return meta


def bucket(op, meta):
    name = meta.get(op, "")
    if op.startswith("attn"):
        return "flash-attn custom calls"
    low = name.lower()
    if "/encoder/" in low:
        return "encoder blocks"
    if "/decoder/" in low:
        return "decoder blocks"
    if "patchify" in low or "take_along_axis" in low:
        return "patchify/targets"
    if "transpose(pretrainvisiontransformer)" in low or "vjp" in low:
        return "model backward (unattributed)"
    if "adamw" in low or "opt" in low.split("/")[-1][:3]:
        return "optimizer"
    if "masking" in low or "sort" in low or "argsort" in low:
        return "mask generation"
    if "mse" in low or "square" in low or "mean" in low:
        return "loss/metrics"
    return "other"


def main():
    trace_root = sys.argv[1]
    hlo_path = sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    meta = hlo_metadata(hlo_path)
    paths = sorted(
        glob.glob(trace_root + "/**/*.trace.json.gz", recursive=True)
    )
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in (n or "")}
    buckets = defaultdict(float)
    detail = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_"):
            continue
        dur = e.get("dur", 0.0)
        total += dur
        b = bucket(name, meta)
        buckets[b] += dur
        # detail: strip trailing op indices from the metadata path
        md = meta.get(name, name)
        md = re.sub(r"\[[^\]]*\]", "", md)
        detail[md[:95]] += dur
    print(f"total device op time {total/1000/n_steps:.2f} ms/step")
    print("--- buckets (ms/step) ---")
    for k, v in sorted(buckets.items(), key=lambda x: -x[1]):
        print(f"{v/1000/n_steps:8.2f}  {k}")
    print("--- top metadata paths (ms/step) ---")
    for k, v in sorted(detail.items(), key=lambda x: -x[1])[:40]:
        print(f"{v/1000/n_steps:8.3f}  {k}")


if __name__ == "__main__":
    main()
