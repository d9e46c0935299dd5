"""On-chip convergence A/B for the FINETUNE step: production fast path
vs the reference configuration, multi-step, mixup on.

Round-3 review finding: the pretrain step has a 50-step convergence
artifact but the classifier step (mixup + SoftTargetCE + fp16 loss-scale
path) — the second production training surface — had nothing equivalent.
This tool runs K full ViT-B classifier finetune steps from one shared
initialization on the same synthetic clip/label stream in three
configurations:

  production: --dtype bfloat16, attn_impl auto (Pallas fused kernels)
  reference : --dtype float32, attn_impl xla  (numerics-conservative)
  fp16      : --dtype float16 + dynamic loss scaling, attn_impl auto
              (the DeepSpeed-fp16-equivalent path,
               reference engine_for_finetuning.py:78-101)

All arms share PRNG keys, so mixup draws, droppath masks, and dropout
masks are identical; loss-curve agreement certifies the gradient stack
of the finetune surface (mixup + CE + loss-scale), not just one step.
Writes a JSON artifact; asserted by the gated test in
tests/test_tpu_kernels.py (MOFO_TPU_TESTS=1).

Usage: PYTHONPATH=/root/repo python tools/convergence_ab_finetune.py \
          [--steps 50] [--batch 16] [--out artifacts/convergence_ft.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_curve(dtype_str, attn_impl, steps, B, clips, labels_np):
    from mofo_tpu.core.config import FinetuneConfig
    from mofo_tpu.models import create_model
    from mofo_tpu.train import optim, schedules
    from mofo_tpu.train.finetune_step import make_finetune_step
    from mofo_tpu.train.train_state import TrainState

    n_classes = 174
    cfg = FinetuneConfig(
        batch_size=B, nb_classes=n_classes, dtype=dtype_str,
    )
    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }[dtype_str]
    model = create_model(
        "vit_base_patch16_224", num_classes=n_classes, dtype=dtype,
        attn_impl=attn_impl,
    )
    clip0 = jnp.asarray(clips[0])
    # f32 master weights in all arms; same key -> identical start point
    params = model.init(jax.random.PRNGKey(1), clip0)["params"]
    lr = schedules.cosine_schedule(5e-4, 1e-6, 1, steps, 0)
    tx = optim.create_optimizer(
        params, lr_schedule=lr, betas=(0.9, 0.999), weight_decay=0.05,
        layer_decay=0.75,
    )
    ls = None
    if dtype_str == "float16":
        from mofo_tpu.train.loss_scale import DynamicLossScale

        ls = DynamicLossScale.create()
    state = TrainState.create(params, tx, loss_scale=ls)
    step = jax.jit(make_finetune_step(model, tx, cfg),
                   donate_argnums=(0,))
    labels = jnp.asarray(labels_np)
    rng = jax.random.PRNGKey(2)  # folded with state.step inside
    losses = []
    for s in range(steps):
        batch = {"clip": jnp.asarray(clips[s]), "label": labels}
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-fp16", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mofo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    # class-correlated synthetic clips (smooth gradients shifted by
    # label) so the loss actually descends, one clip batch per step
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(224), np.arange(224), indexing="ij")
    base = ((yy + xx) / 448.0).astype(np.float32)[None, None, :, :, None]
    labels_np = rng.randint(0, 174, (B,)).astype(np.int32)
    shift = (labels_np / 174.0).astype(np.float32)[
        :, None, None, None, None]
    clips = []
    for s in range(args.steps):
        noise = rng.randn(B, 16, 224, 224, 3).astype(np.float32) * 0.3
        clips.append(base + shift + noise)

    t0 = time.time()
    prod = run_curve("bfloat16", "auto", args.steps, B, clips, labels_np)
    ref = run_curve("float32", "xla", args.steps, B, clips, labels_np)
    arms = {"prod_losses": prod, "ref_losses": ref}
    if not args.no_fp16:
        arms["fp16_losses"] = run_curve(
            "float16", "auto", args.steps, B, clips, labels_np
        )

    def rel(a_curve):
        return max(
            abs(a - b) / max(abs(b), 1e-8) for a, b in zip(a_curve, ref)
        )

    final_rel = abs(prod[-1] - ref[-1]) / abs(ref[-1])
    artifact = {
        "metric": "convergence A/B (pallas+bf16 [+fp16-ls] vs xla+f32, "
                  "ViT-B classifier finetune, mixup on)",
        "steps": args.steps,
        "batch": B,
        "device": str(jax.devices()[0].device_kind),
        **arms,
        "final_rel_diff": final_rel,
        "max_rel_diff": rel(prod),
        "fp16_max_rel_diff": (
            rel(arms["fp16_losses"]) if "fp16_losses" in arms else None
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({
        "final_rel_diff": round(final_rel, 6),
        "max_rel_diff": round(artifact["max_rel_diff"], 6),
        "fp16_max_rel_diff": artifact["fp16_max_rel_diff"],
        "prod_first_last": [prod[0], prod[-1]],
        "ref_first_last": [ref[0], ref[-1]],
    }))


if __name__ == "__main__":
    main()
