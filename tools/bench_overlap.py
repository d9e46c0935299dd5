"""Input-pipeline OVERLAP demonstration: device step time while FFmpeg
decode saturates the host's idle cycles.

Round-2 review finding: PrefetchLoader's decode/compute overlap was
asserted from separate measurements (tools/bench_input.py for the host
side, bench.py for the device side) but never demonstrated jointly.

This tool measures the real ViT-B MOFO pretrain step on-chip twice:

  1. alone (quiet host), and
  2. while a nice-19 subprocess decodes real mp4s through the actual
     PretrainClipDataset/PrefetchLoader machinery, flat out.

A first attempt that ran decode in SAME-process threads at normal
priority measured 3-8x step inflation on this 1-core box: FFmpeg decode
releases the GIL but still saturates the core, starving the dispatch
thread. The production configuration on core-constrained hosts is
priority isolation — decode soaks idle cycles only — which is what the
nice-19 subprocess demonstrates: step inflation within noise while
decode throughput rides the gaps between dispatches.

Prints one JSON line. Usage:
  PYTHONPATH=/root/repo python tools/bench_overlap.py [--steps 20]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

_DECODE_LOOP = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tools!r})
# decode is host-only work: force the CPU backend BEFORE any device
# query so this subprocess never contends for the relay's TPU claim
# (JAX_PLATFORMS=axon is latched by sitecustomize; config wins)
import jax
jax.config.update("jax_platforms", "cpu")
from mofo_tpu.data.filelist import ClipEntry
from mofo_tpu.data.pipeline import PrefetchLoader, PretrainClipDataset
paths = {paths!r}
entries = [ClipEntry(p, 0) for p in paths]
ds = PretrainClipDataset(
    entries, num_frames=16, sampling_rate=2, decode_size=(256, 320)
)
n = 0
t0 = time.time()
while True:
    loader = PrefetchLoader(
        ds, batch_size=4, to_device=False, num_workers=1, drop_last=True
    )
    for b in loader:
        n += 4
        # atomic replace so the parent never reads a half-written file
        # (and the file only appears once the FIRST batch is decoded)
        tmp_path = {count_file!r} + ".tmp"
        with open(tmp_path, "w") as out:
            out.write(json.dumps({{"clips": n, "t": time.time() - t0}}))
        import os as _os
        _os.replace(tmp_path, {count_file!r})
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n-videos", type=int, default=6)
    args = ap.parse_args()

    _T0 = time.time()

    def log(msg):
        print(f"[overlap +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
              flush=True)

    tools_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(tools_dir)
    sys.path.insert(0, tools_dir)
    from bench_input import make_videos

    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()

    # --- the bench-config device step (identical to bench.py) ---
    B = 80
    cfg = PretrainConfig(
        batch_size=B,
        masking=MaskingConfig(mask_type="tube_bb"),
        motion_loss_weight=True,
    )
    model = create_model(
        "pretrain_videomae_base_patch16_224", dtype=jnp.bfloat16
    )
    clip = jax.random.normal(
        jax.random.PRNGKey(0), (B, 16, 224, 224, 3), jnp.float32
    )
    bk1, bk2 = jax.random.split(jax.random.PRNGKey(3))
    xy1 = jax.random.uniform(bk1, (B, 16, 2), minval=0.0, maxval=96.0)
    wh = jax.random.uniform(bk2, (B, 16, 2), minval=48.0, maxval=128.0)
    boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
    vis0 = jnp.zeros((B, cfg.num_tokens - cfg.num_masked), jnp.int32)
    msk0 = jnp.zeros((B, cfg.num_masked), jnp.int32)
    log("init params")
    params = model.init(jax.random.PRNGKey(1), clip, vis0, msk0)["params"]
    lr = schedules.cosine_schedule(1.5e-4, 1e-5, 800, 100, 40)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr),
                   donate_argnums=(0,))
    batch = {"clip": clip, "boxes": boxes}
    rng = jax.random.PRNGKey(2)
    log("compile + warmup step")
    state, metrics = step(state, batch, rng, 0.5)
    float(metrics["loss"])  # warmup through the relay
    log("warm")

    def run_steps(state):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch, rng, 0.5)
        float(metrics["loss"])
        return (time.perf_counter() - t0) / args.steps * 1e3, state

    # phase 1: quiet host (best of two chains)
    ms_alone, state = run_steps(state)
    log(f"phase1 chain A: {ms_alone:.1f} ms/step")
    ms_alone2, state = run_steps(state)
    log(f"phase1 chain B: {ms_alone2:.1f} ms/step")
    ms_alone = min(ms_alone, ms_alone2)

    # phase 2: nice-19 decode subprocess running flat out
    tmp = tempfile.mkdtemp(prefix="mofo_overlap_")
    paths = make_videos(tmp, args.n_videos)
    count_file = os.path.join(tmp, "count.json")
    code = _DECODE_LOOP.format(
        repo=repo, tools=tools_dir, paths=paths, count_file=count_file
    )
    proc = subprocess.Popen(
        ["nice", "-n", "19", sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # let the decoder spin up and produce its first batches
        deadline = time.time() + 180
        while time.time() < deadline and not os.path.exists(count_file):
            if proc.poll() is not None:
                raise RuntimeError(
                    f"decoder subprocess died rc={proc.returncode} before "
                    "producing a batch — overlap cannot be demonstrated"
                )
            time.sleep(1)
        if not os.path.exists(count_file):
            raise RuntimeError("decoder subprocess produced no batch in "
                               "180 s — overlap cannot be demonstrated")
        time.sleep(3)
        log("decoder subprocess warm; phase 2 steps")
        ms_with, state = run_steps(state)
        log(f"phase2 chain A: {ms_with:.1f} ms/step")
        ms_with2, state = run_steps(state)
        log(f"phase2 chain B: {ms_with2:.1f} ms/step")
        ms_with = min(ms_with, ms_with2)
        try:
            stats = json.load(open(count_file))
            decode_cps = stats["clips"] / max(stats["t"], 1e-9)
        except Exception:
            decode_cps = 0.0
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    inflation = (ms_with - ms_alone) / ms_alone
    print(json.dumps({
        "metric": "decode/compute overlap "
                  "(ViT-B MOFO step + nice-19 mp4 decode)",
        "step_ms_alone": round(ms_alone, 2),
        "step_ms_with_decode": round(ms_with, 2),
        "step_inflation": round(inflation, 4),
        "decode_clips_per_s_during": round(decode_cps, 2),
        "host": "1-core dev box (production hosts scale workers)",
    }))


if __name__ == "__main__":
    main()
