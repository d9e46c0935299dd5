"""Input-pipeline OVERLAP demonstration: device step time while FFmpeg
decode saturates the host core.

Round-2 review finding: PrefetchLoader's decode/compute overlap was
asserted from separate measurements (tools/bench_input.py for the host
side, bench.py for the device side) but never demonstrated jointly. This
tool runs the real ViT-B MOFO pretrain step on-chip in three phases:

  1. device-only baseline: K chained steps on a resident batch
  2. the same K steps WHILE a PrefetchLoader decodes real mp4s
     continuously in background threads (decode -> collate -> device_put)
  3. loader-only throughput for reference

and reports the step-time inflation caused by concurrent decode — the
number that must stay small for "the input pipeline overlaps" to be
true. On this 1-core dev box the loader cannot feed 48-clip batches at
step rate (that takes a production host's worker count); what CAN be
shown here, and is, is that decode running flat-out does not slow the
device step (the step is remote TPU work; only the relay's RPC thread
competes for the core).

Prints one JSON line. Usage:
  PYTHONPATH=/root/repo python tools/bench_overlap.py [--steps 20]
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n-videos", type=int, default=6)
    ap.add_argument("--loader-batch", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_input import make_videos

    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.data.filelist import ClipEntry
    from mofo_tpu.data.pipeline import PrefetchLoader, PretrainClipDataset
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()

    # --- the bench-config device step (identical to bench.py) ---
    B = 48
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
    state, metrics = step(state, batch, rng, 0.5)
    float(metrics["loss"])  # warmup through the relay

    def run_steps(state):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch, rng, 0.5)
        float(metrics["loss"])
        return (time.perf_counter() - t0) / args.steps * 1e3, state

    # --- the real-mp4 loader ---
    tmp = tempfile.mkdtemp(prefix="mofo_overlap_")
    paths = make_videos(tmp, args.n_videos)
    entries = [ClipEntry(p, 0) for p in paths]
    ds = PretrainClipDataset(
        entries, num_frames=16, sampling_rate=2, decode_size=(256, 320)
    )

    decoded = {"clips": 0}
    stop = threading.Event()

    def loader_loop():
        loader = PrefetchLoader(
            ds, batch_size=args.loader_batch, to_device=True,
            num_workers=2, drop_last=True,
        )
        while not stop.is_set():
            for b in loader:
                decoded["clips"] += args.loader_batch
                if stop.is_set():
                    return

    # phase 3 first (loader alone) for its clean throughput
    t = threading.Thread(target=loader_loop, daemon=True)
    t0 = time.perf_counter()
    t.start()
    time.sleep(6.0)
    loader_alone = decoded["clips"] / (time.perf_counter() - t0)

    # phase 2: device steps WITH decode running
    ms_with, state = run_steps(state)
    stop.set()
    t.join(timeout=30)
    loader_during = decoded["clips"] / (time.perf_counter() - t0)

    # phase 1: device-only baseline (after, so the compile/cache state
    # is identical)
    ms_alone, state = run_steps(state)

    inflation = (ms_with - ms_alone) / ms_alone
    print(json.dumps({
        "metric": "decode/compute overlap (ViT-B MOFO step + mp4 decode)",
        "step_ms_alone": round(ms_alone, 2),
        "step_ms_with_decode": round(ms_with, 2),
        "step_inflation": round(inflation, 4),
        "loader_clips_per_s": round(loader_alone, 2),
        "loader_clips_per_s_during_steps": round(loader_during, 2),
        "host": "1-core dev box (production hosts scale workers)",
    }))


if __name__ == "__main__":
    main()
