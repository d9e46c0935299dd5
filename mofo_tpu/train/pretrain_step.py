"""The jitted MAE pretraining step.

One XLA program replaces the reference's per-step engine work
(engine_for_pretraining.py:29-196): LR/WD schedule assignment, H2D copy,
target construction under no_grad, autocast forward, MSE, scaler backward,
optimizer step, and DDP gradient allreduce. Sharded inputs + jit insert the
psum over the mesh automatically.

TPU-native: the tube / motion-BB mask is generated ON DEVICE inside the
step from a folded-in PRNG key — the host pipeline ships only clips (and
boxes for MOFO). Gradient accumulation (--update_freq) is a lax.scan over
microbatches.

The MOFO motion-weighted loss (the reference's intended but commented-out
weighted MSE, engine_for_pretraining.py:288-304, with the runner's gradual
1->0 weight list run_mae_pretraining_BB.py:262) is implemented behind
cfg.motion_loss_weight: per-token weight = 1 + w(t) for in-box tokens.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mofo_tpu.core.config import PretrainConfig
from mofo_tpu.ops import masking, patchify
from mofo_tpu.train.optim import global_norm, hutchinson_diag
from mofo_tpu.train.train_state import TrainState, ema_update

Array = jax.Array
Batch = Dict[str, Array]


def generate_mask(
    rng: Array, batch: Batch, cfg: PretrainConfig
) -> Array:
    """On-device mask generation. batch['clip']: (B, T, H, W, C);
    batch may carry 'boxes': (B, T, 4) for motion-aware masking."""
    B = batch["clip"].shape[0]
    t, h, w = cfg.window_size
    if cfg.masking.mask_type == "tube_bb":
        return masking.motion_tube_mask(
            rng,
            batch["boxes"],
            temporal_positions=t,
            patches_per_side=h,
            patch_size=cfg.patch_size,
            mask_ratio=cfg.masking.mask_ratio,
            mask_ratio_bb=cfg.masking.mask_ratio_bb,
            bug_compat=cfg.masking.bug_compat,
            box_reduce=cfg.masking.box_reduce,
        )
    return masking.tube_mask(
        rng,
        B,
        temporal_positions=t,
        patches_per_frame=cfg.patches_per_frame,
        mask_ratio=cfg.masking.mask_ratio,
    )


def _loss_for_batch(
    model,
    params,
    batch: Batch,
    rng: Array,
    cfg: PretrainConfig,
    loss_weight: Optional[Array],
    train: bool,
) -> Array:
    clip = batch["clip"]
    mask_rng, dropout_rng, droppath_rng = jax.random.split(rng, 3)
    mask = generate_mask(mask_rng, batch, cfg)
    vis_idx, masked_idx = masking.mask_to_indices(mask, cfg.num_masked)

    # ONE layout transpose serves both the encoder embedding and the
    # reconstruction targets (patchify_flat); targets gather the masked
    # rows first and reduce per-channel stats over contiguous lanes.
    # In bf16 steps the transpose runs on bf16 pixels: the token-major
    # relayout is 4 full-size HBM passes at the ViT-B geometry (~13
    # ms/step in f32 at B=48, measured) and the embed matmul consumes
    # bf16 anyway; --dtype float32 keeps bit-exact f32 targets.
    bf16 = cfg.dtype == "bfloat16"
    tokens_pix = patchify.patchify_flat(
        clip.astype(jnp.bfloat16) if bf16 else clip,
        patch_size=cfg.patch_size, tubelet_size=cfg.tubelet_size
    )
    # (Measured alternatives, all losers on v5e — see docs/PERF.md for
    # the full history: conv/dot_general embed 171.5/168.4 ms vs 122.7;
    # fusing target normalization into the loss 134.7 / 127.8 ms twice;
    # an optimization_barrier after patchify: no change.)
    targets = patchify.masked_normalized_targets(
        tokens_pix,
        masked_idx,
        normalize_target=cfg.normalize_target,
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )

    weights = None
    if cfg.motion_loss_weight and loss_weight is not None:
        # Per-masked-token weight: 1 + w for tokens inside the motion box.
        # The box test is evaluated AT the masked indices (bit-identical
        # to rasterizing a full (B, N) map and gathering it, minus the
        # gather's 0.69 ms/step of DMA overhead; pure arithmetic).
        in_masked = masking.tokens_in_box(
            batch["boxes"],
            masked_idx,
            tubelet_size=cfg.tubelet_size,
            patches_per_side=cfg.input_size // cfg.patch_size,
            patch_size=cfg.patch_size,
        ).astype(jnp.float32)
        weights = 1.0 + loss_weight * in_masked

    pred = model.apply(
        {"params": params},
        tokens_pix,
        vis_idx,
        masked_idx,
        deterministic=not train,
        rngs={"dropout": dropout_rng, "droppath": droppath_rng}
        if train
        else {},
    )
    return patchify.masked_mse_loss(pred, targets, weights=weights)


def make_pretrain_step(
    model,
    tx: optax.GradientTransformation,
    cfg: PretrainConfig,
    lr_schedule: Optional[np.ndarray] = None,
    augment_fn: Optional[Callable[[Array, Batch], Batch]] = None,
    second_order: bool = False,
) -> Callable[[TrainState, Batch, Array, Array], Tuple[TrainState, Dict]]:
    """Returns step_fn(state, batch, rng, loss_weight) -> (state, metrics).

    batch['clip']: (B, T, H, W, C) normalized clips — or raw decoded
    uint8 frames when augment_fn is given (augment_fn(rng, batch) -> batch
    runs INSIDE the step so decode-to-update is one XLA program).
    With update_freq > 1, B must be divisible by it (microbatches are a
    leading reshape). rng: per-run key; folded with the step counter.
    loss_weight: scalar for the MOFO gradual weighting (0.0 if unused).
    second_order (adahessian): also compute the Hutchinson
    Hessian-diagonal probe of the same stochastic loss (the reference's
    create_graph=True second backward, engine_for_pretraining.py:173)
    and pass it to the optimizer as the hessian_diag extra arg.
    """
    lr_arr = (
        jnp.asarray(lr_schedule) if lr_schedule is not None else None
    )

    def step_fn(state: TrainState, batch: Batch, rng: Array, loss_weight):
        rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None:
            aug_rng, rng = jax.random.split(rng)
            batch = augment_fn(aug_rng, batch)

        def loss_fn(params, mbatch, mrng):
            return _loss_for_batch(
                model, params, mbatch, mrng, cfg, loss_weight, train=True
            )

        def probe(mbatch, mrng):
            # Hessian of the SAME stochastic loss the grads came from
            # (same mask/dropout keys); independent Rademacher key.
            return hutchinson_diag(
                lambda p: jax.grad(loss_fn)(p, mbatch, mrng),
                state.params,
                jax.random.fold_in(mrng, 0x5EED),
            )

        hd = None
        if cfg.update_freq > 1:
            k = cfg.update_freq
            micro = jax.tree.map(
                lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, k)

            def scan_body(carry, xs):
                mbatch, mrng = xs
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, mbatch, mrng
                )
                acc = (loss, grads) + (
                    (probe(mbatch, mrng),) if second_order else ()
                )
                return jax.tree.map(jnp.add, carry, acc), None

            zeros = lambda: jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            init = (jnp.zeros([], jnp.float32), zeros()) + (
                (zeros(),) if second_order else ()
            )
            acc, _ = jax.lax.scan(scan_body, init, (micro, rngs))
            loss = acc[0] / k
            grads = jax.tree.map(lambda g: g / k, acc[1])
            if second_order:
                hd = jax.tree.map(lambda h: h / k, acc[2])
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, rng
            )
            if second_order:
                hd = probe(batch, rng)

        grad_norm = global_norm(grads)
        extra = {"hessian_diag": hd} if second_order else {}
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, **extra
        )
        params = optax.apply_updates(state.params, updates)

        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, 0.9999)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if lr_arr is not None:
            idx = jnp.minimum(state.step, lr_arr.shape[0] - 1)
            metrics["lr"] = lr_arr[idx]
        return new_state, metrics

    return step_fn


def make_eval_loss_fn(
    model, cfg: PretrainConfig
) -> Callable[[Any, Batch, Array], Array]:
    """Deterministic reconstruction loss (for validation curves)."""

    def eval_fn(params, batch: Batch, rng: Array) -> Array:
        return _loss_for_batch(
            model, params, batch, rng, cfg, None, train=False
        )

    return eval_fn
