"""Train state pytree: params + optimizer state + step + optional EMA.

Replaces the reference's model/optimizer/scaler triple plus
timm.utils.ModelEma (run_class_finetuning.py:416-422, updated per step in
engine_for_finetuning.py:86-100). EMA here is a pytree exponential moving
average updated inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Params = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    ema_params: Optional[Params] = None
    # DynamicLossScale state for fp16 training (None = disabled). Mirrors
    # the reference's DeepSpeed fp16 engine (utils.py:499-528).
    loss_scale: Optional[Any] = None

    @classmethod
    def create(
        cls,
        params: Params,
        tx: optax.GradientTransformation,
        use_ema: bool = False,
        loss_scale: Optional[Any] = None,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
            loss_scale=loss_scale,
        )


def ema_update(ema: Params, params: Params, decay: float) -> Params:
    """timm ModelEma rule: ema = decay * ema + (1 - decay) * param."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema,
        params,
    )
