"""Dynamic loss scaling (fp16-parity flag).

The reference finetunes under DeepSpeed's fp16 engine with dynamic loss
scaling (initial_scale_power 7 => 128, loss_scale_window 128 —
utils.py:499-528) or torch.cuda.amp GradScaler (utils.py:347-373).
bfloat16 is the idiomatic TPU answer and the default everywhere in this
framework; this module exists so fp16 loss-curve parity runs are possible.

DynamicLossScale semantics match DeepSpeed's fp16 engine:
  - scale the loss by `scale` before grad; unscale grads after
  - non-finite grads: skip the update, scale *= backoff (0.5)
  - `window` consecutive good steps: scale *= growth (2.0)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Params = Any


class DynamicLossScale(struct.PyTreeNode):
    scale: jnp.ndarray
    good_steps: jnp.ndarray
    growth_interval: int = struct.field(pytree_node=False, default=128)

    @classmethod
    def create(
        cls, initial_scale_power: int = 7, growth_interval: int = 128
    ) -> "DynamicLossScale":
        return cls(
            scale=jnp.asarray(2.0**initial_scale_power, jnp.float32),
            good_steps=jnp.zeros([], jnp.int32),
            growth_interval=growth_interval,
        )

    def value_and_grad(self, loss_fn):
        """Like jax.value_and_grad but scaling the loss; returns
        (loss, grads_unscaled, grads_finite)."""

        def scaled(*args, **kwargs):
            return loss_fn(*args, **kwargs) * self.scale

        def wrapped(*args, **kwargs):
            scaled_loss, grads = jax.value_and_grad(scaled)(
                *args, **kwargs
            )
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32) / self.scale, grads
            )
            finite = jnp.all(
                jnp.stack(
                    [
                        jnp.all(jnp.isfinite(g))
                        for g in jax.tree.leaves(grads)
                    ]
                )
            )
            return scaled_loss / self.scale, grads, finite

        return wrapped

    def update(self, grads_finite: jnp.ndarray) -> "DynamicLossScale":
        good = self.good_steps + 1
        grow = good >= self.growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(grow, self.scale * 2.0, self.scale),
            jnp.maximum(self.scale * 0.5, 1.0),
        )
        new_good = jnp.where(
            grads_finite, jnp.where(grow, 0, good), 0
        )
        return self.replace(scale=new_scale, good_steps=new_good)


def apply_if_finite(new_tree: Params, old_tree: Params,
                    finite: jnp.ndarray) -> Params:
    """Select new values only when grads were finite (skipped step)."""
    return jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_tree, old_tree
    )
