"""Dump the optimized HLO of the bench train step for layout forensics.

Usage: python tools/dump_hlo.py /tmp/step_hlo.txt
Pairs with parse_trace.py: look up the hot op names from the trace in
the optimized module to see what XLA actually scheduled (layout copies,
fusion shapes, dtypes).
"""

import sys

import jax
import jax.numpy as jnp


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
    import os
    B = int(os.environ.get("MOFO_BENCH_BATCH", "80"))
    cfg = PretrainConfig(
        batch_size=B,
        masking=MaskingConfig(mask_type="tube_bb"),
        motion_loss_weight=True,
    )
    model = create_model(
        "pretrain_videomae_base_patch16_224", dtype=jnp.bfloat16
    )
    clip = jnp.zeros((B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.zeros((B, 16, 4), jnp.float32)
    vis0 = jnp.zeros((B, cfg.num_tokens - cfg.num_masked), jnp.int32)
    msk0 = jnp.zeros((B, cfg.num_masked), jnp.int32)
    params = jax.eval_shape(
        lambda k: model.init(k, clip, vis0, msk0)["params"],
        jax.random.PRNGKey(1),
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    lr = schedules.cosine_schedule(1.5e-4, 1e-5, 800, 100, 40)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_pretrain_step(model, tx, cfg, lr),
                   donate_argnums=(0,))
    batch = {"clip": clip, "boxes": boxes}
    rng = jax.random.PRNGKey(2)
    compiled = step.lower(state, batch, rng, 0.5).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "chars")


if __name__ == "__main__":
    main()
