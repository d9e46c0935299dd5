"""Finetune-step throughput on one TPU chip (ViT-B classifier,
16x224^2, 1568 tokens through all 12 blocks + mixup + SoftTargetCE).

Same chained-dispatch methodology as bench.py. Prints one JSON line;
not part of the driver's BENCH artifact (that's the pretrain step) —
this tracks the other hot path end to end.

Usage: PYTHONPATH=/root/repo python tools/bench_finetune.py [--bb] [--eval]
--bb benches the BB-focused MCA-fusing step (per-frame motion boxes
threaded into the model; MCA cross-attention fusing head) instead of the
plain classifier. --eval benches the forward-only eval/inference step
(make_eval_step: logits + CE + acc1/acc5 — the serving path) instead of
the training step; composes with --bb.
"""

import sys

import json
import os
import time

import jax
import jax.numpy as jnp


def vit_b_cls_fwd_flops(
    batch: int, n_classes: int = 174, n: int = 1568,
    dim: int = 768, depth: int = 12,
) -> float:
    def block_flops(n, d, mlp=4):
        return 2 * n * d * (3 * d + d + 2 * mlp * d) + 4 * n * n * d

    blocks = depth * block_flops(n, dim)
    patch = 2 * n * 1536 * dim
    head = 2 * dim * n_classes
    return batch * (patch + blocks + head)


def main():
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import FinetuneConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.finetune_step import make_finetune_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
    bb = "--bb" in sys.argv
    ev = "--eval" in sys.argv
    # --frames 32 benches the long-clip variant (3136 tokens through the
    # blocked flash fallback kernels); default is the 16-frame recipe
    frames = 16
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    # --img 384 benches the high-resolution registry variants (reference
    # modeling_finetune.py:637-705 ships 384/512 as first-class): 4608
    # tokens at 16f/384px, through the blocked flash fallback kernels.
    # --model large benches vit_large_patch16_* (1024-dim, 16-head, 24-deep).
    img = 224
    if "--img" in sys.argv:
        img = int(sys.argv[sys.argv.index("--img") + 1])
    mname = "base"
    if "--model" in sys.argv:
        mname = sys.argv[sys.argv.index("--model") + 1]
    dim, depth = {"small": (384, 12), "base": (768, 12),
                  "large": (1024, 24)}[mname]
    B = int(os.environ.get("MOFO_BENCH_BATCH", "48" if ev else "24"))
    if "MOFO_BENCH_BATCH" not in os.environ:
        # keep roughly the 16f/224px/ViT-B activation footprint
        scale = (frames / 16) * (img / 224) ** 2 * (dim / 768)
        B = max(1, int(B / scale))
    n_classes = 174
    n_tok = frames // 2 * (img // 16) ** 2
    cfg = FinetuneConfig(
        batch_size=B, nb_classes=n_classes, num_frames=frames,
        input_size=img,
    )
    clip = jax.random.normal(
        jax.random.PRNGKey(0), (B, frames, img, img, 3), jnp.float32
    )
    labels = jax.random.randint(
        jax.random.PRNGKey(1), (B,), 0, n_classes
    )
    if bb:
        model = create_model(
            "vit_base_patch16_224_BB_focused", num_classes=n_classes,
            fusing_method="MCA", dtype=jnp.bfloat16, all_frames=frames,
        )
        bk1, bk2 = jax.random.split(jax.random.PRNGKey(4))
        xy1 = jax.random.uniform(bk1, (B, frames, 2), minval=0.0, maxval=96.0)
        wh = jax.random.uniform(bk2, (B, frames, 2), minval=48.0, maxval=128.0)
        boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
        params = model.init(jax.random.PRNGKey(2), clip, boxes)["params"]
    else:
        model = create_model(
            f"vit_{mname}_patch16_{img}", num_classes=n_classes,
            dtype=jnp.bfloat16, all_frames=frames,
        )
        params = model.init(jax.random.PRNGKey(2), clip)["params"]
    lr = schedules.cosine_schedule(5e-4, 1e-6, 100, 100, 5)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.999), weight_decay=0.05,
        layer_decay=0.75,
    )
    state = TrainState.create(params, tx)
    batch = {"clip": clip, "label": labels}
    if bb:
        batch["boxes"] = boxes
    rng = jax.random.PRNGKey(3)

    if ev:
        from mofo_tpu.train.finetune_step import make_eval_step

        eval_fn = jax.jit(make_eval_step(model, cfg, bb_focused=bb))

        # the relay memoizes identical (program, inputs) executions
        # (CLAUDE.md measurement rules); eval has no evolving donated
        # state, so thread the previous loss back into the clip as a
        # perturbation (1e-5 * loss: big enough to flip f32 mantissa
        # bits on O(1) pixels, far below augmentation noise) — every
        # dispatch gets distinct inputs AND a data dependence chains
        # the executions
        def run_once(carry):
            _, prev = carry
            b2 = dict(batch)
            b2["clip"] = batch["clip"] + prev * jnp.float32(1e-5)
            m = eval_fn(state.params, b2)
            return (None, m["loss"]), m

        carry0 = (None, jnp.float32(0.0))
        flops = vit_b_cls_fwd_flops(B, n_classes, n_tok, dim, depth)  # forward only
    else:
        step = jax.jit(make_finetune_step(model, tx, cfg, bb_focused=bb),
                       donate_argnums=(0,))

        def run_once(carry):
            st, _ = carry
            st, m = step(st, batch, rng)
            return (st, m["loss"]), m

        carry0 = (state, jnp.float32(0.0))
        flops = 3 * vit_b_cls_fwd_flops(B, n_classes, n_tok, dim, depth)

    # shared harness: warmup + scalar fetch (block through the relay),
    # then a chained run with ONE scalar fetch at the end
    carry, metrics = run_once(carry0)
    float(metrics["loss"])
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        carry, metrics = run_once(carry)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    if bb:
        # MCA fusing block (queries+kv over all 1568 tokens, 3 heads x
        # 64): q/kv/proj projections + mlp + two 192-dim attn matmuls
        n, d, ahd = n_tok, 768, 192
        mca = 2 * n * d * (d + 2 * ahd + ahd + 2 * 4 * d) \
            + 4 * n * n * ahd
        flops += (1 if ev else 3) * B * mca
    peak = 197e12
    print(json.dumps({
        "metric": f"clips/sec/chip ViT-{mname[0].upper()} " + ("BB-MCA " if bb else "")
        + ("eval" if ev else "finetune")
        + (f" {frames}f" if frames != 16 else "")
        + (f" {img}px" if img != 224 else ""),
        "value": round(B / dt, 2),
        "unit": "clips/s",
        "extra": {
            "step_ms": round(dt * 1e3, 2),
            "batch": B,
            "mfu": round(flops / dt / peak, 4),
            "loss": final_loss,
        },
    }))


if __name__ == "__main__":
    main()
