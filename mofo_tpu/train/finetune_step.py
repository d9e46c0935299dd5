"""Jitted finetuning train / eval steps (plain and BB-focused).

Replaces the reference engines (engine_for_finetuning.py:25-225): mixup on
device, criterion selection, DeepSpeed/AMP mechanics collapsed into one XLA
program, EMA, gradient accumulation, acc1/acc5 metrics. The BB-focused
variant threads per-frame boxes into the model (train_one_epoch_BB_focused,
engine_for_finetuning.py:504-558).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mofo_tpu.core.config import FinetuneConfig
from mofo_tpu.ops.mixup import Mixup
from mofo_tpu.train import losses
from mofo_tpu.train.optim import global_norm, hutchinson_diag
from mofo_tpu.train.train_state import TrainState, ema_update

Array = jax.Array
Batch = Dict[str, Array]


def build_criterion(cfg: FinetuneConfig, mixup_active: bool) -> Callable:
    """Reference criterion selection (run_class_finetuning.py:476-495)."""
    if mixup_active:
        return losses.soft_target_cross_entropy  # takes soft targets
    if cfg.smoothing > 0:
        return lambda logits, targets: losses.label_smoothing_cross_entropy(
            logits, targets, cfg.smoothing
        )
    return losses.cross_entropy


def make_finetune_step(
    model,
    tx: optax.GradientTransformation,
    cfg: FinetuneConfig,
    lr_schedule: Optional[np.ndarray] = None,
    bb_focused: bool = False,
    augment_fn: Optional[Callable[[Array, Batch], Batch]] = None,
    second_order: bool = False,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict]]:
    """step_fn(state, batch, rng) -> (state, metrics).

    batch: {'clip': (B,T,H,W,C), 'label': (B,) int} (+ 'boxes': (B,T,4)
    when bb_focused). With augment_fn given, batch carries raw decoded
    uint8 frames and augmentation runs inside the step.
    second_order (adahessian): also compute the Hutchinson
    Hessian-diagonal probe (reference engine_for_finetuning.py:91) and
    pass it to the optimizer as the hessian_diag extra arg; under fp16
    it is unscaled alongside the gradients (H of scale·L = scale·H).
    """
    mixup_active = (
        cfg.mixup > 0
        or cfg.cutmix > 0.0
        or cfg.cutmix_minmax is not None
    )
    mixup_fn = Mixup(
        mixup_alpha=cfg.mixup,
        cutmix_alpha=cfg.cutmix,
        cutmix_minmax=cfg.cutmix_minmax,
        prob=cfg.mixup_prob,
        switch_prob=cfg.mixup_switch_prob,
        mode=cfg.mixup_mode,
        label_smoothing=cfg.smoothing,
        num_classes=cfg.nb_classes,
    )
    criterion = build_criterion(cfg, mixup_active)
    lr_arr = jnp.asarray(lr_schedule) if lr_schedule is not None else None

    def apply_model(params, clip, boxes, rngs):
        if bb_focused:
            return model.apply(
                {"params": params}, clip, boxes, deterministic=False,
                rngs=rngs,
            )
        return model.apply(
            {"params": params}, clip, deterministic=False, rngs=rngs
        )

    def micro_loss(params, mbatch, mrng):
        mix_rng, dropout_rng, droppath_rng = jax.random.split(mrng, 3)
        clip, label = mbatch["clip"], mbatch["label"]
        if mixup_active:
            clip, target = mixup_fn(mix_rng, clip, label)
        else:
            target = label
        logits = apply_model(
            params,
            clip,
            mbatch.get("boxes"),
            {"dropout": dropout_rng, "droppath": droppath_rng},
        )
        return criterion(logits, target)

    def step_fn(state: TrainState, batch: Batch, rng: Array):
        rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None:
            aug_rng, rng = jax.random.split(rng)
            batch = augment_fn(aug_rng, batch)

        # fp16 path: scale the loss before grad, unscale after, skip the
        # update on non-finite grads (DeepSpeed fp16 engine semantics,
        # reference engine_for_finetuning.py:78-101, utils.py:499-528).
        use_ls = state.loss_scale is not None
        scale = state.loss_scale.scale if use_ls else jnp.float32(1.0)

        def scaled_loss(params, mbatch, mrng):
            return micro_loss(params, mbatch, mrng) * scale

        def probe(mbatch, mrng):
            # Hessian probe of the SAME stochastic (scaled) loss; the
            # scale divides out with the gradients below.
            return hutchinson_diag(
                lambda p: jax.grad(scaled_loss)(p, mbatch, mrng),
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
                loss, grads = jax.value_and_grad(scaled_loss)(
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
            loss = acc[0] / (k * scale)
            grads = jax.tree.map(lambda g: g / (k * scale), acc[1])
            if second_order:
                hd = jax.tree.map(lambda h: h / (k * scale), acc[2])
        else:
            loss, grads = jax.value_and_grad(scaled_loss)(
                state.params, batch, rng
            )
            loss = loss / scale
            if second_order:
                hd = probe(batch, rng)
            if use_ls:
                grads = jax.tree.map(lambda g: g / scale, grads)
                if second_order:
                    hd = jax.tree.map(lambda h: h / scale, hd)

        grad_norm = global_norm(grads)
        extra = {"hessian_diag": hd} if second_order else {}
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, **extra
        )
        params = optax.apply_updates(state.params, updates)

        new_ls = state.loss_scale
        if use_ls:
            from mofo_tpu.train.loss_scale import apply_if_finite

            finite = jnp.isfinite(grad_norm)
            params = apply_if_finite(params, state.params, finite)
            opt_state = apply_if_finite(opt_state, state.opt_state, finite)
            new_ls = state.loss_scale.update(finite)

        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, cfg.model_ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            loss_scale=new_ls,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if use_ls:
            metrics["loss_scale"] = new_ls.scale
            metrics["skipped"] = 1.0 - jnp.isfinite(grad_norm).astype(
                jnp.float32
            )
        if lr_arr is not None:
            idx = jnp.minimum(state.step, lr_arr.shape[0] - 1)
            metrics["lr"] = lr_arr[idx]
        return new_state, metrics

    return step_fn


def make_eval_step(
    model, cfg: FinetuneConfig, bb_focused: bool = False
) -> Callable[[Any, Batch], Dict]:
    """Validation step (validation_one_epoch, engine_for_finetuning.py:
    172-225): CE loss + acc1/acc5. Also returns logits so callers can run
    the multi-view merge or EK marginalization."""

    def eval_fn(params, batch: Batch) -> Dict:
        clip, label = batch["clip"], batch["label"]
        if bb_focused:
            logits = model.apply(
                {"params": params}, clip, batch["boxes"]
            )
        else:
            logits = model.apply({"params": params}, clip)
        # "valid" flags real rows when the loader padded the final batch
        # to a mesh-divisible size; metrics average over real rows only.
        valid = batch.get("valid")
        w = (
            jnp.ones(label.shape[0], jnp.float32)
            if valid is None
            else valid.astype(jnp.float32)
        )
        n = jnp.maximum(jnp.sum(w), 1.0)
        nll = losses.cross_entropy_per_sample(logits, label)
        hit1, hit5 = losses.topk_hits(logits, label, topk=(1, 5))
        return {
            "loss": jnp.sum(nll * w) / n,
            "acc1": jnp.sum(hit1 * w) / n * 100.0,
            "acc5": jnp.sum(hit5 * w) / n * 100.0,
            "n_valid": n,
            "logits": logits.astype(jnp.float32),
        }

    return eval_fn
