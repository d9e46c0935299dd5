"""Profile a full training step on-device via jax.profiler.

The axon relay supports device tracing (vm.trace.json.gz contains
/device:TPU:0 op events with durations). This runs a few bench-config
steps under jax.profiler.trace and writes the trace, which is the
ground truth the chained-dispatch microbenches approximate.

Covers all three production training surfaces:
    python tools/profile_step.py [outdir]                 # MOFO pretrain
    python tools/profile_step.py [outdir] --finetune      # classifier
    python tools/profile_step.py [outdir] --bb            # BB-MCA fusing
    ... [--batch N] overrides the surface's bench-default batch.

Parse with tools/parse_trace.py <outdir>; attribute to module paths
with tools/dump_hlo.py + tools/attribute_trace.py.
"""

import argparse

import jax
import jax.numpy as jnp


def build_pretrain(B):
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

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

    def run(state):
        return step(state, batch, jax.random.PRNGKey(2), 0.5)

    return state, run


def build_finetune(B, bb):
    from mofo_tpu.core.config import FinetuneConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.finetune_step import make_finetune_step
    from mofo_tpu.train.train_state import TrainState

    n_classes = 174
    cfg = FinetuneConfig(batch_size=B, nb_classes=n_classes)
    clip = jax.random.normal(
        jax.random.PRNGKey(0), (B, 16, 224, 224, 3), jnp.float32
    )
    labels = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, n_classes)
    batch = {"clip": clip, "label": labels}
    if bb:
        model = create_model(
            "vit_base_patch16_224_BB_focused", num_classes=n_classes,
            fusing_method="MCA", dtype=jnp.bfloat16,
        )
        bk1, bk2 = jax.random.split(jax.random.PRNGKey(4))
        xy1 = jax.random.uniform(bk1, (B, 16, 2), minval=0.0, maxval=96.0)
        wh = jax.random.uniform(bk2, (B, 16, 2), minval=48.0, maxval=128.0)
        boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
        params = model.init(jax.random.PRNGKey(2), clip, boxes)["params"]
        batch["boxes"] = boxes
    else:
        model = create_model(
            "vit_base_patch16_224", num_classes=n_classes,
            dtype=jnp.bfloat16,
        )
        params = model.init(jax.random.PRNGKey(2), clip)["params"]
    lr = schedules.cosine_schedule(5e-4, 1e-6, 100, 100, 5)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.999), weight_decay=0.05,
        layer_decay=0.75,
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_finetune_step(model, tx, cfg, bb_focused=bb),
                   donate_argnums=(0,))

    def run(state):
        return step(state, batch, jax.random.PRNGKey(3))

    return state, run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/mofo_trace")
    ap.add_argument("--finetune", action="store_true")
    ap.add_argument("--bb", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.bb or args.finetune:
        B = args.batch or 24
        state, run = build_finetune(B, args.bb)
    else:
        B = args.batch or 80
        state, run = build_pretrain(B)

    state, metrics = run(state)
    float(metrics["loss"])  # force warmup completion through the relay

    with jax.profiler.trace(args.outdir):
        for _ in range(3):
            state, metrics = run(state)
        float(metrics["loss"])
    print("trace written to", args.outdir)


if __name__ == "__main__":
    main()
