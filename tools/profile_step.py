"""Profile the ViT-B MOFO pretrain step on-device via jax.profiler.

The axon relay supports device tracing (vm.trace.json.gz contains
/device:TPU:0 op events with durations). This runs a few bench-config
steps under jax.profiler.trace and prints device time aggregated by HLO
op name, which is the ground truth the chained-dispatch microbenches
approximate.

Usage: python tools/profile_step.py [outdir] ; parse with
       python tools/parse_trace.py <outdir>
"""

import sys

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mofo_trace"
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
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
    float(metrics["loss"])  # force warmup completion through the relay

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics = step(state, batch, rng, 0.5)
        float(metrics["loss"])
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
