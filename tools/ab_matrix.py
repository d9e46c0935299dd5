"""Full-step A/B matrix driver for bench.py configurations.

Runs bench.py as a subprocess once per config (env overrides), parses
the one-line JSON result, and appends every record to a JSONL log so a
crashed sweep loses nothing. Only full-step deltas from bench.py are
trustworthy through the relay (docs/PERF.md "Measurement methodology");
this harness decided the round-4 defaults (docs/ab_r4.jsonl): tanh GELU
for bf16 steps became the default (-10.4 ms), the LN/layout/patchify/
pos/clip experiments lost or tied and their code paths were DELETED —
the env knobs those configs set no longer exist. What remains to sweep
is the bench batch size.

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
    "head": {},  # current defaults (B=80, tanh GELU in bf16)
    **{
        f"b{b}": {"MOFO_BENCH_BATCH": str(b)}
        for b in (40, 48, 56, 64, 72, 80, 88, 96, 112, 128)
    },
}


def run_one(name: str, env_over: dict, reps: int, log_path: str):
    env = dict(os.environ)
    env.update(env_over)
    recs = []
    for rep in range(reps):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, env=env, cwd=REPO,
                timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # record the timeout and keep sweeping — "a crashed sweep
            # loses nothing" includes hung relays (BENCH_r03 scenario)
            p = None
        wall = time.time() - t0
        line = ""
        if p is not None:
            for ln in reversed(p.stdout.strip().splitlines() or [""]):
                if ln.startswith("{"):
                    line = ln
                    break
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            rec = (
                {"error": "timeout", "timeout_s": 3600}
                if p is None
                else {"error": "no_json", "rc": p.returncode,
                      "stderr_tail": p.stderr[-400:]}
            )
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
