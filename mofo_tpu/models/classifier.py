"""Video classification ViT (finetuning backbone + head).

Reference: /root/reference/modeling_finetune.py:305-420.
  - frozen sin-cos positional embedding, pos dropout
  - 12 blocks over all 1568 tokens
  - use_mean_pooling=True (default): fc_norm(mean over tokens); else CLS-less
    x[:, 0]
  - head: trunc-normal(.02) init scaled by init_scale (0.001 in the recipe)

Init parity: all linears trunc-normal(.02) with zero bias (reference
lines 366-373), unlike the pretrain model's xavier init.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.models.layers import (
    Block,
    PatchEmbed,
    get_sinusoid_encoding_table,
    trunc_normal_init,
)

Array = jax.Array
Dtype = Any


def scaled_trunc_normal(scale: float, stddev: float = 0.02):
    base = nn.initializers.truncated_normal(stddev)

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class VisionTransformer(nn.Module):
    """Classification backbone (modeling_finetune.py:305-409)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    init_scale: float = 0.0
    all_frames: int = 16
    tubelet_size: int = 2
    use_mean_pooling: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    sow_attn: bool = False

    def backbone_tokens(self, x: Array, deterministic: bool = True) -> Array:
        """Patch-embed + pos + blocks -> (B, N, D) token features."""
        patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            num_frames=self.all_frames,
            tubelet_size=self.tubelet_size,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(),
            name="patch_embed",
        )
        tokens = patch_embed(x.astype(self.dtype))
        pos = get_sinusoid_encoding_table(
            patch_embed.num_patches, self.embed_dim
        ).astype(tokens.dtype)
        tokens = tokens + pos
        tokens = nn.Dropout(rate=self.drop_rate, name="pos_drop")(
            tokens, deterministic=deterministic
        )

        dpr = [
            float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)
        ]
        for i in range(self.depth):
            tokens = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                init_values=self.init_values,
                dtype=self.dtype,
                kernel_init=trunc_normal_init(),
                attn_impl=self.attn_impl,
                sow_attn=self.sow_attn,
                name=f"blocks_{i}",
            )(tokens, deterministic=deterministic)

        if not self.use_mean_pooling:
            tokens = nn.LayerNorm(
                epsilon=1e-6, dtype=jnp.float32, name="norm"
            )(tokens).astype(self.dtype)
        return tokens

    def pool(self, tokens: Array) -> Array:
        if self.use_mean_pooling:
            pooled = jnp.mean(tokens, axis=1)
            pooled = nn.LayerNorm(
                epsilon=1e-6, dtype=jnp.float32, name="fc_norm"
            )(pooled).astype(self.dtype)
        else:
            pooled = tokens[:, 0]
        return pooled

    def head_out(self, pooled: Array) -> Array:
        if self.num_classes <= 0:
            return pooled
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=scaled_trunc_normal(self.init_scale),
            bias_init=nn.initializers.zeros,
            name="head",
        )(pooled)

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = True,
        return_features: bool = False,
        return_tokens: bool = False,
    ) -> Array:
        """x: (B, T, H, W, C). Returns (B, num_classes) logits; pooled
        (B, D) features when return_features=True (the reference's
        VisionTransformer_feat_ext, modeling_finetune.py:411-420); or raw
        (B, N, D) token features when return_tokens=True (used by the
        BB-focused classifier wrapper)."""
        tokens = self.backbone_tokens(x, deterministic=deterministic)
        if return_tokens:
            return tokens
        pooled = self.pool(tokens)
        if return_features:
            return pooled
        return self.head_out(pooled)
