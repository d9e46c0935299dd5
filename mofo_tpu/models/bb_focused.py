"""MOFO BB-focused classifier: fuses pooled in-box vs out-of-box token
features before the classification head.

Reference: /root/reference/modeling_finetune.py:422-635
(VisionTransformer_BB_focused). Behavior:
  - A per-token boolean "inside motion box" map. The reference rasterizes it
    with a weight-1 Conv3d over a painted indicator volume under no_grad
    (lines 589-631); the net effect is: token (t, j, k) is in-box iff the
    box of frame 2t OR 2t+1 overlaps its 16x16 patch. We compute that map
    analytically on the patch grid (ops.masking.box_to_patch_map) — no conv,
    no gradient stops needed.
  - Fusing modes over in-box (local) vs out-box (global) token sets
    (lines 552-585):
      'org'           plain mean over all tokens
      'weighted_mean' (mean_in * 1 + mean_out * 0.5) / 2
      'soft_attn'     SoftAttention(local) + SoftAttention(global)
      'MCA'           1-layer 3-head cross-attention block (queries = in-box
                      tokens, kv = out-box tokens), then mean over in-box
  - Per-sample fallback to the plain token mean when no token is in-box
    (lines 561-563).

The reference loops over the batch in Python with ragged gathers; here every
mode is a masked, fully batched computation (masked segment means / masked
attention bias), so the whole forward stays one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mofo_tpu.models.classifier import VisionTransformer, scaled_trunc_normal
from mofo_tpu.models.layers import MCABlock, SoftAttention, trunc_normal_init
from mofo_tpu.ops.masking import box_to_patch_map

Array = jax.Array
Dtype = Any

FUSING_MODES = ("org", "weighted_mean", "soft_attn", "MCA")


def token_in_box_map(
    boxes: Array,
    *,
    tubelet_size: int = 2,
    patches_per_side: int = 14,
    patch_size: int = 16,
) -> Array:
    """boxes: (B, T, 4) per-frame pixel boxes -> bool (B, N) token map.

    Token (t, j, k) is in-box iff any of its tubelet frames' boxes overlaps
    patch (j, k) — the exact effect of the reference's painted-volume conv
    (sum of indicator pixels > 0, modeling_finetune.py:591-630).
    """
    per_frame = box_to_patch_map(
        boxes,
        patches_per_side=patches_per_side,
        patch_size=patch_size,
        bug_compat=False,
        edge="paint",
    )  # (B, T, ppf)
    B, T, ppf = per_frame.shape
    t = T // tubelet_size
    per_token = per_frame[:, : t * tubelet_size].reshape(
        B, t, tubelet_size, ppf
    )
    per_token = jnp.any(per_token, axis=2)  # (B, t, ppf)
    return per_token.reshape(B, t * ppf)


def _masked_mean(x: Array, m: Array) -> Array:
    """Mean of x (B, N, D) over tokens where m (B, N) is True; zero-count
    rows return 0 (callers handle the fallback)."""
    mf = m.astype(jnp.float32)[..., None]
    s = jnp.sum(x.astype(jnp.float32) * mf, axis=1)
    c = jnp.maximum(jnp.sum(mf, axis=1), 1.0)
    return (s / c).astype(x.dtype)


class VisionTransformerBBFocused(nn.Module):
    """BB-focused classifier (modeling_finetune.py:422-635), vectorized."""

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
    fusing_method: str = "weighted_mean"
    mca_depth: int = 1
    mca_num_heads: int = 3
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: Array, boxes: Array, deterministic: bool = True
    ) -> Array:
        """x: (B, T, H, W, C); boxes: (B, T, 4) per-frame pixel boxes.
        Returns (B, num_classes) logits."""
        assert self.fusing_method in FUSING_MODES, self.fusing_method

        backbone = VisionTransformer(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            num_classes=0,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            all_frames=self.all_frames,
            tubelet_size=self.tubelet_size,
            use_mean_pooling=self.use_mean_pooling,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="backbone",
        )
        tokens = backbone(
            x, deterministic=deterministic, return_tokens=True
        )
        B, N, D = tokens.shape

        in_map = token_in_box_map(
            boxes,
            tubelet_size=self.tubelet_size,
            patches_per_side=self.img_size // self.patch_size,
            patch_size=self.patch_size,
        )  # (B, N) bool
        has_in = jnp.any(in_map, axis=1)  # (B,)
        out_map = ~in_map
        has_out = jnp.any(out_map, axis=1)

        plain_mean = jnp.mean(tokens, axis=1)

        if self.fusing_method == "org":
            fused = plain_mean
        elif self.fusing_method == "weighted_mean":
            in_mean = _masked_mean(tokens, in_map)
            out_mean = _masked_mean(tokens, out_map)
            fused = (in_mean * 1.0 + out_mean * 0.5) / 2.0
        elif self.fusing_method == "soft_attn":
            local = SoftAttention(
                feature_dim=self.embed_dim,
                dtype=self.dtype,
                name="soft_att_local",
            )(tokens, in_map)
            glob = SoftAttention(
                feature_dim=self.embed_dim,
                dtype=self.dtype,
                name="soft_att_global",
            )(tokens, out_map)
            fused = local + glob
        else:  # MCA
            # Reference edge case (modeling_finetune.py:131-133): empty kv
            # set -> attend to the in-box tokens themselves.
            kv_mask = jnp.where(has_out[:, None], out_map, in_map)
            mca_tokens = tokens
            for i in range(self.mca_depth):
                mca_tokens = MCABlock(
                    dim=self.embed_dim,
                    num_heads=self.mca_num_heads,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path_rate=0.0,
                    init_values=self.init_values,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    name=f"local_MCA_{i}",
                )(
                    mca_tokens,
                    tokens,
                    deterministic=deterministic,
                    kv_mask=kv_mask,
                )
            fused = _masked_mean(mca_tokens, in_map)

        if self.fusing_method != "org":
            # Per-sample fallback: no in-box tokens -> plain token mean.
            fused = jnp.where(has_in[:, None], fused, plain_mean)

        pooled = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, name="fc_norm"
        )(fused).astype(self.dtype)
        if self.num_classes <= 0:
            return pooled
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=scaled_trunc_normal(self.init_scale),
            bias_init=nn.initializers.zeros,
            name="head",
        )(pooled)
