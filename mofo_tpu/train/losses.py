"""Classification losses.

Criterion selection mirrors run_class_finetuning.py:476-495:
  - mixup active        -> SoftTargetCrossEntropy
  - label smoothing > 0 -> LabelSmoothingCrossEntropy
  - otherwise           -> plain CrossEntropy
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def soft_target_cross_entropy(logits: Array, soft_targets: Array) -> Array:
    """timm SoftTargetCrossEntropy: mean over batch of
    -sum(target * log_softmax(logits))."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))


def label_smoothing_cross_entropy(
    logits: Array, targets: Array, smoothing: float = 0.1
) -> Array:
    """timm LabelSmoothingCrossEntropy."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def cross_entropy(logits: Array, targets: Array) -> Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(
        -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    )


def accuracy(logits: Array, targets: Array, topk=(1,)) -> tuple:
    """timm accuracy: top-k percentage (0..100)."""
    ranks = jnp.argsort(-logits, axis=-1)
    out = []
    for k in topk:
        hit = jnp.any(ranks[:, :k] == targets[:, None], axis=-1)
        out.append(jnp.mean(hit.astype(jnp.float32)) * 100.0)
    return tuple(out)


def cross_entropy_per_sample(logits: Array, targets: Array) -> Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


def topk_hits(logits: Array, targets: Array, topk=(1,)) -> tuple:
    """Per-sample top-k hit indicators (float 0/1)."""
    ranks = jnp.argsort(-logits, axis=-1)
    return tuple(
        jnp.any(ranks[:, :k] == targets[:, None], axis=-1).astype(
            jnp.float32
        )
        for k in topk
    )
