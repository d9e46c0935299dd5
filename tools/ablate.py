"""Component-level timing of the ViT-B MOFO pretrain step on the chip.

Measurement rules (CLAUDE.md): the axon relay memoizes identical
(program, inputs) executions and per-dispatch RPC overhead is ~1.5-2ms,
so every measurement here (a) chains K dispatches with a data dependence
through a scalar so they execute back-to-back on device, (b) fetches ONE
scalar at the end, and (c) folds a varying scalar into the inputs so no
two dispatches are identical.

Usage: python tools/ablate.py [component ...]
Components: step fwd enc dec flash opt targets maskgen
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 48
K = 20  # chained dispatches per measurement


def timed(name, fn, *args):
    """fn(scalar, *args) -> scalar; chain K data-dependent dispatches."""
    f = jax.jit(fn)
    s = jnp.float32(0.001)
    out = f(s, *args)  # compile + warmup
    float(out)
    t0 = time.perf_counter()
    s = out * 1e-9
    for _ in range(K):
        s = f(s, *args) * 1e-9
    float(s)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:10s} {dt:8.2f} ms")
    return dt


def main(which):
    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.core.config import MaskingConfig, PretrainConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.pretrain_step import make_pretrain_step
    from mofo_tpu.train.train_state import TrainState

    enable_compilation_cache()
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
    rng = jax.random.PRNGKey(2)

    if "step" in which:
        lr = schedules.cosine_schedule(1.5e-4, 1e-5, 800, 100, 40)
        tx = optim.create_optimizer(
            params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
        )
        state = TrainState.create(params, tx)
        step = make_pretrain_step(model, tx, cfg, lr)

        def full(s, state, batch):
            st, m = step(state, batch, rng, 0.5 + s)
            return m["loss"]

        # NOTE: state is donated nowhere here; the chain varies loss_weight
        timed("step", full, state, {"clip": clip, "boxes": boxes})

    if "fwd" in which:
        from mofo_tpu.train.pretrain_step import _loss_for_batch

        def fwd(s, params, batch):
            return _loss_for_batch(
                model, params, batch, rng, cfg, s, train=True
            )

        timed("fwd", fwd, params, {"clip": clip, "boxes": boxes})

    if "grad" in which:
        from mofo_tpu.train.pretrain_step import _loss_for_batch

        def gradonly(s, params, batch):
            l, g = jax.value_and_grad(
                lambda p: _loss_for_batch(
                    model, p, batch, rng, cfg, s, train=True
                )
            )(params)
            from mofo_tpu.train.optim import global_norm
            return l + global_norm(g)

        timed("fwd+bwd", gradonly, params, {"clip": clip, "boxes": boxes})

    if "enc" in which or "dec" in which:
        from mofo_tpu.models.layers import Block

        def stack_time(name, n_tok, dim, heads, depth):
            blocks = [
                Block(dim=dim, num_heads=heads, qkv_bias=True,
                      dtype=jnp.bfloat16, name=f"b{i}")
                for i in range(depth)
            ]
            import flax.linen as nn

            class Stack(nn.Module):
                @nn.compact
                def __call__(self, x):
                    for i in range(depth):
                        x = Block(dim=dim, num_heads=heads, qkv_bias=True,
                                  dtype=jnp.bfloat16, name=f"b{i}")(x)
                    return x

            m = Stack()
            x = jax.random.normal(
                jax.random.PRNGKey(0), (B, n_tok, dim), jnp.bfloat16
            )
            p = m.init(jax.random.PRNGKey(1), x)["params"]

            def f(s, p, x):
                def loss(p):
                    o = m.apply({"params": p}, x + s.astype(x.dtype))
                    return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

                l, g = jax.value_and_grad(loss)(p)
                from mofo_tpu.train.optim import global_norm
                return l + global_norm(g)

            timed(name, f, p, x)

        if "enc" in which:
            stack_time("enc12", 160, 768, 12, 12)
        if "dec" in which:
            stack_time("dec4", 1568, 384, 6, 4)

    if "flash" in which:
        from mofo_tpu.ops.flash_attention import flash_attention_mh

        q = jax.random.normal(
            jax.random.PRNGKey(4), (B, 1568, 384), jnp.bfloat16
        )
        k = jax.random.normal(
            jax.random.PRNGKey(5), (B, 1568, 384), jnp.bfloat16
        )
        v = jax.random.normal(
            jax.random.PRNGKey(6), (B, 1568, 384), jnp.bfloat16
        )

        def fl(s, q, k, v):
            def loss(q, k, v):
                o = flash_attention_mh(
                    q + s.astype(q.dtype), k, v, scale=0.125, num_heads=6
                )
                return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

            l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(
                jnp.sum(g.astype(jnp.float32) ** 2) for g in gs
            ) * 1e-9

        timed("flash4x", lambda s, q, k, v: (
            fl(s, q, k, v) + fl(s + 1e-6, q, k, v)
            + fl(s + 2e-6, q, k, v) + fl(s + 3e-6, q, k, v)
        ), q, k, v)

    if "opt" in which:
        lr = schedules.cosine_schedule(1.5e-4, 1e-5, 800, 100, 40)
        tx = optim.create_optimizer(
            params, lr_schedule=lr, betas=(0.9, 0.95), weight_decay=0.05
        )
        opt_state = tx.init(params)
        import optax

        def op(s, params, opt_state):
            grads = jax.tree.map(
                lambda p: (p * 1e-4 + s).astype(jnp.float32), params
            )
            updates, new_os = tx.update(grads, opt_state, params)
            new_p = optax.apply_updates(params, updates)
            from mofo_tpu.train.optim import global_norm
            return global_norm(new_p)

        timed("optimizer", op, params, opt_state)

    if "targets" in which:
        from mofo_tpu.ops import patchify

        idx = jnp.tile(
            jnp.arange(cfg.num_masked, dtype=jnp.int32)[None], (B, 1)
        )

        def tg(s, clip, idx):
            toks = patchify.patchify_flat(
                clip + s, patch_size=16, tubelet_size=2
            )
            t = patchify.masked_normalized_targets(
                toks, idx, normalize_target=True,
                compute_dtype=jnp.bfloat16,
            )
            return jnp.sum(t.astype(jnp.float32) ** 2) * 1e-9

        timed("targets", tg, clip, idx)

    if "maskgen" in which:
        from mofo_tpu.ops import masking

        def mg(s, boxes):
            m = masking.motion_tube_mask(
                jax.random.PRNGKey(9), boxes + s,
                temporal_positions=8, patches_per_side=14,
                patch_size=16, mask_ratio=0.9, mask_ratio_bb=0.75,
            )
            vi, mi = masking.mask_to_indices(m, cfg.num_masked)
            return jnp.sum(vi) * 1e-9 + jnp.sum(mi) * 1e-9

        timed("maskgen", mg, boxes)


if __name__ == "__main__":
    args = sys.argv[1:] or [
        "step", "grad", "enc", "dec", "flash", "opt", "targets", "maskgen"
    ]
    main(args)
