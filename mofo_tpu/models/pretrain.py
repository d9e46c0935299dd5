"""Masked video autoencoder (VideoMAE / MOFO pretraining model).

Reference: /root/reference/modeling_pretrain.py. Encoder keeps only the
visible tokens (90% of tubes dropped BEFORE the blocks, line 90); decoder
runs on the full token set and predicts 1536 pixels per masked token
(lines 152-161, 253-266).

TPU-native differences from the reference:
  - Masked-token dropping is a static-shape gather (take_along_axis with the
    index split from ops.masking.mask_to_indices) instead of boolean
    indexing; equal per-sample counts make this exact.
  - Patch embedding is a reshape+matmul (see models/layers.PatchEmbed).
  - Compute dtype configurable (bfloat16 on TPU); LayerNorm and softmax stay
    float32.

Init parity: encoder/decoder linears are xavier_uniform with zero bias
(reference lines 60-67); mask_token is trunc-normal std=.02.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.models.layers import (
    Block,
    PatchEmbed,
    get_sinusoid_encoding_table,
)

Array = jax.Array
Dtype = Any

_xavier = nn.initializers.xavier_uniform()


class PretrainEncoder(nn.Module):
    """ViT encoder over visible tokens only (modeling_pretrain.py:23-101)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
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
    tubelet_size: int = 2
    num_frames: int = 16
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: Array, vis_idx: Array, deterministic: bool = True
    ) -> Array:
        """x: (B, T, H, W, C); vis_idx: (B, N_vis) visible token positions.
        Returns (B, N_vis, D)."""
        patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            num_frames=self.num_frames,
            tubelet_size=self.tubelet_size,
            dtype=self.dtype,
            kernel_init=_xavier,
            name="patch_embed",
        )
        tokens = patch_embed(x)  # (B, N, D)
        pos = get_sinusoid_encoding_table(
            patch_embed.num_patches, self.embed_dim
        ).astype(tokens.dtype)
        tokens = tokens + pos

        from mofo_tpu.ops.masking import gather_tokens

        x_vis = gather_tokens(tokens, vis_idx)

        dpr = [
            float(r)
            for r in np.linspace(0.0, self.drop_path_rate, self.depth)
        ]
        for i in range(self.depth):
            x_vis = Block(
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
                kernel_init=_xavier,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(x_vis, deterministic=deterministic)

        x_vis = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            x_vis
        ).astype(self.dtype)
        return x_vis


class PretrainDecoder(nn.Module):
    """Shallow decoder predicting pixels for masked tokens
    (modeling_pretrain.py:103-161)."""

    patch_size: int = 16
    num_classes: int = 1536
    embed_dim: int = 384
    depth: int = 4
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    tubelet_size: int = 2
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: Array, return_token_num: int, deterministic: bool = True
    ) -> Array:
        dpr = [
            float(r)
            for r in np.linspace(0.0, self.drop_path_rate, self.depth)
        ]
        for i in range(self.depth):
            x = Block(
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
                kernel_init=_xavier,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)

        if return_token_num > 0:
            x = x[:, -return_token_num:]
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            x
        ).astype(self.dtype)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=_xavier,
            bias_init=nn.initializers.zeros,
            name="head",
        )(x)
        return x


class PretrainVisionTransformer(nn.Module):
    """Full MAE: encoder -> encoder_to_decoder -> decoder
    (modeling_pretrain.py:163-266)."""

    img_size: int = 224
    patch_size: int = 16
    encoder_in_chans: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_num_classes: int = 1536
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    tubelet_size: int = 2
    num_frames: int = 16
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (
            (self.img_size // self.patch_size) ** 2
            * (self.num_frames // self.tubelet_size)
        )

    @nn.compact
    def __call__(
        self,
        x: Array,
        vis_idx: Array,
        masked_idx: Array,
        deterministic: bool = True,
    ) -> Array:
        """x: (B, T, H, W, C) channel-last clip.
        vis_idx: (B, N_vis), masked_idx: (B, N_mask) — static-shape index
        split of the boolean tube mask (ops.masking.mask_to_indices).
        Returns (B, N_mask, decoder_num_classes) pixel predictions.
        """
        x = x.astype(self.dtype)
        x_vis = PretrainEncoder(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.encoder_in_chans,
            embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth,
            num_heads=self.encoder_num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            tubelet_size=self.tubelet_size,
            num_frames=self.num_frames,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x, vis_idx, deterministic=deterministic)

        x_vis = nn.Dense(
            self.decoder_embed_dim,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=_xavier,
            name="encoder_to_decoder",
        )(x_vis)

        mask_token = self.param(
            "mask_token",
            nn.initializers.truncated_normal(0.02),
            (1, 1, self.decoder_embed_dim),
            jnp.float32,
        ).astype(self.dtype)

        # Decoder positional table at decoder width; gathered to follow the
        # (shuffled-visible ++ masked) token order, reference lines 258-263.
        # (An arithmetic variant that evaluated the sinusoid AT the indices
        # instead of gathering table rows was full-step NEUTRAL — 122.4/
        # 122.6 vs 122.5 ms, docs/ab_r4.jsonl pos_arith — and was deleted;
        # the float64-built table is the bit-parity construction.)
        pos_dec = get_sinusoid_encoding_table(
            self.num_patches, self.decoder_embed_dim
        ).astype(self.dtype)
        B = x.shape[0]
        pos_dec = jnp.broadcast_to(
            pos_dec, (B,) + pos_dec.shape[1:]
        )
        pos_vis = jnp.take_along_axis(
            pos_dec, vis_idx[..., None], axis=1
        )
        pos_mask = jnp.take_along_axis(
            pos_dec, masked_idx[..., None], axis=1
        )

        x_full = jnp.concatenate(
            [x_vis + pos_vis, mask_token + pos_mask], axis=1
        )

        n_mask = masked_idx.shape[1]
        out = PretrainDecoder(
            patch_size=self.patch_size,
            num_classes=self.decoder_num_classes,
            embed_dim=self.decoder_embed_dim,
            depth=self.decoder_depth,
            num_heads=self.decoder_num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            tubelet_size=self.tubelet_size,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="decoder",
        )(x_full, n_mask, deterministic=deterministic)
        return out
