"""Full-step A/B matrix driver for the PERF.md experiment knobs.

Runs bench.py as a subprocess once per config (env overrides), parses
the one-line JSON result, and appends every record to a JSONL log so a
crashed sweep loses nothing. Only full-step deltas from bench.py are
trustworthy through the relay (docs/PERF.md "Measurement methodology");
this is the harness that decides which knobs become defaults.

Usage:
    python tools/ab_matrix.py [--log docs/ab_r4.jsonl] [--configs NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> env overrides (on top of the current environment)
CONFIGS = {
    "head": {},
    "patchify_lr": {"MOFO_PATCHIFY": "lr"},
    "ln_mm": {"MOFO_LN": "mm"},
    "ln_mmvjp": {"MOFO_LN": "mmvjp"},
    "pos_arith": {"MOFO_POS": "arith"},
    "layout_auto": {"MOFO_BENCH_LAYOUT": "auto"},
    "clip_bf16": {"MOFO_BENCH_CLIP": "bf16"},
    "gelu_tanh": {"MOFO_GELU": "tanh"},
    # knob-combo regression config (tests/test_knob_combo.py guards it)
    "combo_all": {
        "MOFO_PATCHIFY": "lr",
        "MOFO_LN": "mmvjp",
        "MOFO_POS": "arith",
        "MOFO_BENCH_LAYOUT": "auto",
        "MOFO_BENCH_CLIP": "bf16",
        "MOFO_GELU": "tanh",
    },
    # batch sweep at whatever default config is current
    "b40": {"MOFO_BENCH_BATCH": "40"},
    "b56": {"MOFO_BENCH_BATCH": "56"},
    "b64": {"MOFO_BENCH_BATCH": "64"},
    # round-4 follow-ups: gelu_tanh was the big winner (−10.4 ms);
    # re-sweep batch with it on, and try it with the two tiny wins
    # (pos_arith, clip_bf16) without the measured losers (ln, layout)
    "gelu_b40": {"MOFO_GELU": "tanh", "MOFO_BENCH_BATCH": "40"},
    "gelu_b56": {"MOFO_GELU": "tanh", "MOFO_BENCH_BATCH": "56"},
    "gelu_b64": {"MOFO_GELU": "tanh", "MOFO_BENCH_BATCH": "64"},
    "combo_fast": {
        "MOFO_GELU": "tanh",
        "MOFO_POS": "arith",
        "MOFO_BENCH_CLIP": "bf16",
    },
}


def run_one(name: str, env_over: dict, reps: int, log_path: str):
    env = dict(os.environ)
    env.update(env_over)
    recs = []
    for rep in range(reps):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=3600,
        )
        wall = time.time() - t0
        line = ""
        for ln in reversed(p.stdout.strip().splitlines() or [""]):
            if ln.startswith("{"):
                line = ln
                break
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            rec = {"error": "no_json", "rc": p.returncode,
                   "stderr_tail": p.stderr[-400:]}
        rec["config"] = name
        rec["env"] = env_over
        rec["rep"] = rep
        rec["wall_s"] = round(wall, 1)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        sm = rec.get("extra", {}).get("step_ms")
        print(f"[{name} rep{rep}] step_ms={sm} value={rec.get('value')} "
              f"wall={wall:.0f}s", flush=True)
        recs.append(rec)
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=os.path.join(REPO, "docs/ab_r4.jsonl"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()
    for name in args.configs:
        run_one(name, CONFIGS[name], args.reps, args.log)


if __name__ == "__main__":
    main()
