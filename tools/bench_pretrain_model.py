"""Pretrain-step throughput for the non-flagship model widths.

bench.py is the driver artifact and stays pinned to the ViT-B MOFO step;
this sibling benches the other registry widths (reference
modeling_pretrain.py:268-338 family) with the same chained-dispatch
methodology, to show the framework holds its efficiency across the
model family:

    PYTHONPATH=/root/repo python tools/bench_pretrain_model.py \
        [--model small|base|large] [--batch N]

ViT-S's 192-dim decoder attention (3 heads x 64) is not 128-aligned, so
it runs the head-major flash kernels instead of the fused-qkv interface
— this bench also keeps that dispatch path measured.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

GEOM = {
    # enc_dim, enc_depth, dec_dim, dec_depth (registry presets; decoder
    # depth 4 is the runner default, run_mae_pretraining.py:32)
    "small": (384, 12, 192, 4),
    "base": (768, 12, 384, 4),
    "large": (1024, 24, 512, 4),
}


def pretrain_fwd_flops(batch, enc_dim, enc_depth, dec_dim, dec_depth):
    def block_flops(n, d, mlp=4):
        return 2 * n * d * (3 * d + d + 2 * mlp * d) + 4 * n * n * d

    n_tokens, n_vis = 1568, 160
    enc = enc_depth * block_flops(n_vis, enc_dim)
    patch = 2 * n_tokens * 1536 * enc_dim
    e2d = 2 * n_vis * enc_dim * dec_dim
    dec = dec_depth * block_flops(n_tokens, dec_dim)
    head = 2 * (n_tokens - n_vis) * dec_dim * 1536
    return batch * (patch + enc + e2d + dec + head)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import detect_peak_flops, init_backend_with_retry

    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    name = "large"
    if "--model" in sys.argv:
        name = sys.argv[sys.argv.index("--model") + 1]
    enc_dim, enc_depth, dec_dim, dec_depth = GEOM[name]
    # default batches: ~the ViT-B B=80 activation footprint scaled by
    # encoder width (sweep with --batch)
    default_b = {"small": 128, "base": 80, "large": 32}[name]
    B = default_b
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])

    init_backend_with_retry()
    enable_compilation_cache()
    print("[bench] backend up:", jax.devices()[0].device_kind,
          file=sys.stderr, flush=True)
    cfg = PretrainConfig(
        batch_size=B,
        masking=MaskingConfig(mask_type="tube_bb"),
        motion_loss_weight=True,
    )
    model = create_model(
        f"pretrain_videomae_{name}_patch16_224", dtype=jnp.bfloat16
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
    batch = {"clip": clip, "boxes": boxes}
    rng = jax.random.PRNGKey(2)
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr),
                   donate_argnums=(0,))

    print("[bench] params initialized; compiling step...",
          file=sys.stderr, flush=True)
    state, metrics = step(state, batch, rng, 0.5)
    float(metrics["loss"])
    print("[bench] first step done; timing...", file=sys.stderr, flush=True)

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, rng, 0.5)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    train_flops = 3 * pretrain_fwd_flops(
        B, enc_dim, enc_depth, dec_dim, dec_depth
    )
    peak = detect_peak_flops()
    mfu = train_flops / dt / peak
    print(json.dumps({
        "metric": f"clips/sec/chip ViT-{name[0].upper()} MOFO pretrain",
        "value": round(B / dt, 2),
        "unit": "clips/s",
        "extra": {
            "step_ms": round(dt * 1e3, 2),
            "batch": B,
            "mfu": round(mfu, 4),
            "peak_flops": peak,
            "device": str(jax.devices()[0].device_kind),
            "loss": final_loss,
        },
    }))


if __name__ == "__main__":
    main()
