"""On-chip convergence A/B: the production fast path vs the reference
configuration, multi-step.

Round-2 review finding: the optimized step (Pallas flash kernels + bf16
compute + bf16 targets + folded softmax scales + software pipelining)
was verified by one-step gradient checks only; nothing showed the fast
path TRAINS the same. This tool runs K full ViT-B MOFO pretrain steps
from one shared initialization on the same synthetic clip stream in two
configurations:

  production: --dtype bfloat16, attn_impl auto (Pallas fused kernels)
  reference : --dtype float32, attn_impl xla  (plain XLA attention,
              f32 everywhere — the numerics-conservative baseline)

and records both loss curves. Agreement within the expected bf16 noise
band certifies the whole optimization stack's gradients, not just one
step. Writes a JSON artifact; asserted by the gated test in
tests/test_tpu_kernels.py (MOFO_TPU_TESTS=1).

Usage: PYTHONPATH=/root/repo python tools/convergence_ab.py \
          [--steps 50] [--batch 16] [--out artifacts/convergence_ab.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_curve(dtype_str, attn_impl, steps, B, clips, boxes_np):
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    cfg = PretrainConfig(
        batch_size=B,
        dtype=dtype_str,
        masking=MaskingConfig(mask_type="tube_bb"),
        motion_loss_weight=True,
    )
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    model = create_model(
        "pretrain_videomae_base_patch16_224", dtype=dtype,
        attn_impl=attn_impl,
    )
    vis0 = jnp.zeros((B, cfg.num_tokens - cfg.num_masked), jnp.int32)
    msk0 = jnp.zeros((B, cfg.num_masked), jnp.int32)
    clip0 = jnp.asarray(clips[0])
    # params are f32 master weights in BOTH configs; the same PRNG key
    # makes the two runs start from the identical point
    params = model.init(jax.random.PRNGKey(1), clip0, vis0, msk0)["params"]
    lr = schedules.cosine_schedule(1.5e-4, 0.0, 1, steps, 0)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr),
                   donate_argnums=(0,))
    boxes = jnp.asarray(boxes_np)
    rng = jax.random.PRNGKey(2)  # folded with state.step inside
    # Two relay-cost rules (learned the hard way when the first 500-step
    # run timed out at 60 min):
    #  1. transfer the batch pool to HBM ONCE — jnp.asarray of a 154 MB
    #     host clip EVERY step is seconds of relay transfer per step
    #     (the pool is bounded at 16 batches = 2.5 GB precisely so it
    #     can live on device);
    #  2. keep per-step losses on device and fetch once at the end — a
    #     float() per step is a full relay round trip. A periodic sync
    #     bounds the async dispatch queue depth.
    clips_dev = [jax.device_put(c) for c in clips]
    losses_dev = []
    for s in range(steps):
        # cycling a bounded batch pool keeps long horizons (300-500
        # steps) on-device; epoch-style repeats also exercise the
        # schedule/EMA interaction the 50-step artifact could not
        batch = {"clip": clips_dev[s % len(clips_dev)], "boxes": boxes}
        state, metrics = step(state, batch, rng, 0.5)
        losses_dev.append(metrics["loss"])
        if (s + 1) % 25 == 0:
            float(losses_dev[-1])
    return [float(x) for x in np.asarray(jnp.stack(losses_dev))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pool", type=int, default=None,
                    help="distinct synthetic batches to cycle "
                         "(default min(steps, 32); bounds host RAM "
                         "for long horizons)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    # structured synthetic clips (smooth gradients + motion), one per
    # step, shared verbatim by both configs
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(224), np.arange(224), indexing="ij")
    base = ((yy + xx) / 448.0).astype(np.float32)[None, None, :, :, None]
    pool = args.pool or min(args.steps, 32)
    clips = []
    for s in range(pool):
        noise = rng.randn(B, 16, 224, 224, 3).astype(np.float32) * 0.3
        shift = (np.arange(16) / 16.0).astype(np.float32)[
            None, :, None, None, None]
        clips.append(base + shift + noise)
    xy1 = rng.uniform(0, 96, (B, 16, 2)).astype(np.float32)
    wh = rng.uniform(48, 128, (B, 16, 2)).astype(np.float32)
    boxes_np = np.concatenate([xy1, xy1 + wh], axis=-1)

    t0 = time.time()
    prod = run_curve("bfloat16", "auto", args.steps, B, clips, boxes_np)
    ref = run_curve("float32", "xla", args.steps, B, clips, boxes_np)
    final_rel = abs(prod[-1] - ref[-1]) / abs(ref[-1])
    max_rel = max(
        abs(a - b) / abs(b) for a, b in zip(prod, ref)
    )
    artifact = {
        "metric": "convergence A/B (pallas+bf16 vs xla+f32, "
                  "ViT-B MOFO pretrain)",
        "steps": args.steps,
        "pool": pool,
        "batch": B,
        "device": str(jax.devices()[0].device_kind),
        "prod_losses": prod,
        "ref_losses": ref,
        "final_rel_diff": final_rel,
        "max_rel_diff": max_rel,
        "wall_s": round(time.time() - t0, 1),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({
        "final_rel_diff": round(final_rel, 6),
        "max_rel_diff": round(max_rel, 6),
        "prod_first_last": [prod[0], prod[-1]],
        "ref_first_last": [ref[0], ref[-1]],
    }))


if __name__ == "__main__":
    main()
