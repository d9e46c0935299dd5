"""Attention kernels.

Two implementations behind one interface:
  - "xla": einsum softmax einsum; XLA fuses this well for short sequences
    (the MOFO pretrain encoder runs on only 160 visible tokens).
  - "pallas": blockwise fused flash attention for the 1568-token
    decoder/finetune sequences (see mofo_tpu/ops/flash_attention.py).

"auto" picks pallas on TPU for sequences long enough to benefit, xla
otherwise. The reference computes naive O(N^2) attention in
modeling_finetune.py:88-95; numerics here match it (softmax in float32).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Sequences at least this long route through the flash kernel on TPU.
# 128 was measured faster than the old 512 threshold: sending the
# 160-token pretrain encoder through the multihead flash kernel instead
# of XLA attention cut the full ViT-B MOFO step 151.9 -> 146.1 ms on
# v5e (the XLA path round-trips B*H*N^2 logits+probs through HBM even
# at short N).
_PALLAS_MIN_SEQ = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def xla_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float,
    bias: Optional[Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Reference-parity attention. q,k,v: (B, H, N, Dh) -> (B, H, N, Dh)
    (head-major layout — matches what the projection einsums produce
    without transposes).

    Softmax is computed in float32 regardless of input dtype (torch autocast
    does the same for softmax).
    """
    dtype = q.dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, probs.shape
        )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=dtype
    )
    return out


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float,
    bias: Optional[Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    impl: str = "auto",
) -> Array:
    """Dispatching attention entry point. q,k,v: (B, H, N, Dh)."""
    if impl == "auto":
        use_pallas = (
            _on_tpu()
            and q.shape[2] >= _PALLAS_MIN_SEQ
            and q.shape[2] == k.shape[2]
            and bias is None
            and (deterministic or dropout_rate == 0.0)
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        # the fused kernel supports neither a bias term nor attention
        # dropout — refuse rather than silently dropping them
        if bias is not None:
            raise ValueError(
                "impl='pallas' does not support an attention bias; use "
                "impl='xla' (or 'auto')."
            )
        if dropout_rate > 0.0 and not deterministic:
            raise ValueError(
                "impl='pallas' does not support attention dropout "
                f"(attn_drop_rate={dropout_rate}); use impl='xla' (or "
                "'auto', which falls back when dropout is active)."
            )
        # f16 operands are upcast to bf16 at the kernel boundary
        # (Mosaic has no f16 type) — see flash_attention._f16_boundary
        from mofo_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return xla_attention(
        q,
        k,
        v,
        scale=scale,
        bias=bias,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
