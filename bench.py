"""Benchmark: ViT-B MOFO pretrain train step on one TPU chip.

Prints ONE JSON line:
  {"metric": "clips/sec/chip ViT-B MOFO pretrain", "value": N,
   "unit": "clips/s", "vs_baseline": N, "extra": {...}}

vs_baseline is measured MFU / 0.45 (the BASELINE.json north-star target of
>=45% MFU for the ViT-B pretrain step; the reference repo publishes no
throughput numbers to compare against directly).

FLOPs are computed analytically from the model geometry (fwd matmul FLOPs;
train step = ~3x fwd for fwd+bwd).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _probe_backend():
    """One tiny computation that forces backend init + a device round
    trip (through the axon relay, only an output fetch reliably proves
    the chip is reachable)."""
    x = jnp.ones((8, 8))
    return float((x @ x).sum())


def init_backend_with_retry(attempts=3, backoff_s=120.0, probe=_probe_backend):
    """Backend init with bounded retry.

    The relay has produced multi-hour UNAVAILABLE windows (BENCH_r03) and
    transient flaps; retrying a few times distinguishes a blip from an
    outage. On final failure, emit ONE structured JSON line so the driver
    record says "relay down", not "code broken", then exit rc 1.
    """
    last_err = None
    for i in range(attempts):
        try:
            probe()
            return
        except Exception as e:  # backend init errors are RuntimeErrors
            last_err = e
            if i + 1 < attempts:
                print(
                    f"[bench] backend init failed (attempt {i + 1}/"
                    f"{attempts}): {e}; retrying in {backoff_s:.0f}s",
                    file=sys.stderr,
                )
                time.sleep(backoff_s)
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip ViT-B MOFO pretrain",
                "value": 0.0,
                "unit": "clips/s",
                "vs_baseline": 0.0,
                "error": "backend_unavailable",
                "extra": {
                    "attempts": attempts,
                    "last_error": str(last_err)[:500],
                },
            }
        )
    )
    sys.exit(1)


# bf16 peak FLOP/s per chip by TPU generation (dense).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def detect_peak_flops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 197e12
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def vit_b_pretrain_fwd_flops(batch: int) -> float:
    """Analytic forward matmul FLOPs for ViT-B MAE (16x224^2, mask .9)."""
    def block_flops(n, d, mlp=4):
        # qkv + proj + mlp: 2*n*d*(3d + d + 2*mlp*d); attention: 2*2*n^2*d
        return 2 * n * d * (3 * d + d + 2 * mlp * d) + 4 * n * n * d

    n_tokens, n_vis = 1568, 160
    enc = 12 * block_flops(n_vis, 768)
    patch = 2 * n_tokens * 1536 * 768
    e2d = 2 * n_vis * 768 * 384
    dec = 4 * block_flops(n_tokens, 384)
    head = 2 * (n_tokens - n_vis) * 384 * 1536
    return batch * (patch + enc + e2d + dec + head)


def main():
    init_backend_with_retry()
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
    # B=80 is the measured throughput peak with tanh GELU (r4 sweep,
    # docs/ab_r4.jsonl: 40/48/56/64/72/80/96/112 → 446.6 c/s at 80)
    B = int(os.environ.get("MOFO_BENCH_BATCH", "80"))
    # The full MOFO step: motion-BB tube masking from per-frame boxes +
    # the gradual in-box loss upweighting — not the plain VideoMAE step.
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
    # synthetic per-frame motion boxes (x1, y1, x2, y2) in pixel space
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
    # (Two measured-neutral input-contract experiments were deleted after
    # the r4 full-step A/B — docs/ab_r4.jsonl: bf16-resident clips
    # 122.2 vs 122.5 ms, AUTO entry layouts 123.7 ms, a LOSS.)
    # donate state like the CLI does (cli/pretrain.py) so XLA updates
    # params/moments in place instead of allocating fresh buffers
    batch = {"clip": clip, "boxes": boxes}
    rng = jax.random.PRNGKey(2)
    step_fn = make_pretrain_step(model, tx, cfg, lr)
    step = jax.jit(step_fn, donate_argnums=(0,))

    # warmup + compile; fetch a scalar to force completion (through the
    # relay, block_until_ready can return early — only an output fetch
    # reliably waits)
    state, metrics = step(state, batch, rng, 0.5)
    float(metrics["loss"])

    # enqueue a chain of steps, fetch ONE scalar at the end: steps
    # execute back-to-back on device, so per-dispatch host/RPC overhead
    # doesn't pollute the measurement
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, rng, 0.5)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    clips_per_sec = B / dt
    train_flops = 3 * vit_b_pretrain_fwd_flops(B)
    peak = detect_peak_flops()
    mfu = train_flops / dt / peak
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip ViT-B MOFO pretrain",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(mfu / 0.45, 4),
                "extra": {
                    "step_ms": round(dt * 1e3, 2),
                    "batch": B,
                    "mfu": round(mfu, 4),
                    "peak_flops": peak,
                    "device": str(jax.devices()[0].device_kind),
                    "loss": final_loss,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
