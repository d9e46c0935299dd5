"""Finetune-step throughput on one TPU chip (ViT-B classifier,
16x224^2, 1568 tokens through all 12 blocks + mixup + SoftTargetCE).

Same chained-dispatch methodology as bench.py. Prints one JSON line;
not part of the driver's BENCH artifact (that's the pretrain step) —
this tracks the other hot path end to end.

Usage: PYTHONPATH=/root/repo python tools/bench_finetune.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def vit_b_cls_fwd_flops(batch: int, n_classes: int = 174) -> float:
    def block_flops(n, d, mlp=4):
        return 2 * n * d * (3 * d + d + 2 * mlp * d) + 4 * n * n * d

    n = 1568
    blocks = 12 * block_flops(n, 768)
    patch = 2 * n * 1536 * 768
    head = 2 * 768 * n_classes
    return batch * (patch + blocks + head)


def main():
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import FinetuneConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.finetune_step import make_finetune_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
    B = int(os.environ.get("MOFO_BENCH_BATCH", "24"))
    n_classes = 174
    cfg = FinetuneConfig(batch_size=B, nb_classes=n_classes)
    model = create_model(
        "vit_base_patch16_224", num_classes=n_classes, dtype=jnp.bfloat16
    )
    clip = jax.random.normal(
        jax.random.PRNGKey(0), (B, 16, 224, 224, 3), jnp.float32
    )
    labels = jax.random.randint(
        jax.random.PRNGKey(1), (B,), 0, n_classes
    )
    params = model.init(jax.random.PRNGKey(2), clip)["params"]
    lr = schedules.cosine_schedule(5e-4, 1e-6, 100, 100, 5)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.999), weight_decay=0.05,
        layer_decay=0.75,
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_finetune_step(model, tx, cfg),
                   donate_argnums=(0,))
    batch = {"clip": clip, "label": labels}
    rng = jax.random.PRNGKey(3)

    state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, rng)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    flops = 3 * vit_b_cls_fwd_flops(B, n_classes)
    peak = 197e12
    print(json.dumps({
        "metric": "clips/sec/chip ViT-B finetune",
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
