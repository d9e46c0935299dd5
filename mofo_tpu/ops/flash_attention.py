"""Blockwise fused flash attention (Pallas, TPU).

Placeholder: currently delegates to the XLA path while the Pallas kernel is
being brought up. The dispatch interface (ops.attention.dot_product_attention)
is final; swapping in the kernel is invisible to callers.
"""

from __future__ import annotations

import jax


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float
) -> jax.Array:
    from mofo_tpu.ops.attention import xla_attention

    return xla_attention(q, k, v, scale=scale)
