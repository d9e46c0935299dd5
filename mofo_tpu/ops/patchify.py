"""Patchify / unpatchify and normalized-pixel reconstruction targets.

Behavioral parity with the reference target construction in
engine_for_pretraining.py:43-63:
  1. un-normalize the (ImageNet-normalized) clip back to [0, 1]
  2. rearrange 'b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c'
  3. per-patch normalize: (x - mean) / (sqrt(unbiased var) + 1e-6), stats
     over the 512 pixel positions per channel
  4. flatten to (B, N, 1536) with channel fastest — '(p c)'
  5. gather the masked positions as labels

Everything here is pure jnp, designed to run inside the jitted train step
(no host round trips). Layout: clips are channel-last (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mofo_tpu.core import constants

Array = jax.Array


def _wide(dtype) -> jnp.dtype:
    """f32 accumulation dtype, except f64 inputs stay f64 (the x64
    parity-artifact path must not round through f32)."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def patchify(
    clip: Array, patch_size: int = 16, tubelet_size: int = 2
) -> Array:
    """(B, T, H, W, C) -> (B, N, P, C) where N = t*h*w tokens and
    P = tubelet*patch*patch pixel positions, matching the reference
    rearrange 'b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c'."""
    B, T, H, W, C = clip.shape
    p0, p = tubelet_size, patch_size
    t, h, w = T // p0, H // p, W // p
    x = clip.reshape(B, t, p0, h, p, w, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B,t,h,w,p0,p1,p2,C)
    return x.reshape(B, t * h * w, p0 * p * p, C)


def unpatchify(
    patches: Array,
    t: int,
    h: int,
    w: int,
    patch_size: int = 16,
    tubelet_size: int = 2,
) -> Array:
    """(B, N, P, C) -> (B, T, H, W, C). Inverse of patchify."""
    B, N, P, C = patches.shape
    p0, p = tubelet_size, patch_size
    x = patches.reshape(B, t, h, w, p0, p, p, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B,t,p0,h,p1,w,p2,C)
    return x.reshape(B, t * p0, h * p, w * p, C)


def unnormalize_clip(
    clip: Array,
    mean: Tuple[float, ...] = constants.IMAGENET_DEFAULT_MEAN,
    std: Tuple[float, ...] = constants.IMAGENET_DEFAULT_STD,
) -> Array:
    """Invert ImageNet normalization: x * std + mean. Channel-last."""
    mean_a = jnp.asarray(mean, dtype=clip.dtype)
    std_a = jnp.asarray(std, dtype=clip.dtype)
    return clip * std_a + mean_a


def normalized_pixel_targets(
    clip: Array,
    *,
    normalize_target: bool = True,
    patch_size: int = 16,
    tubelet_size: int = 2,
    input_normalized: bool = True,
    compute_dtype=jnp.float32,
) -> Array:
    """Build per-token reconstruction targets (B, N, P*C), channel fastest.

    clip: (B, T, H, W, C), ImageNet-normalized unless input_normalized=False.
    Matches engine_for_pretraining.py:43-63 (float32 statistics, unbiased
    variance, eps added to std).

    Performance note: the per-patch stats are reduced on the UNTRANSPOSED
    8-D view and normalization happens in place, so the expensive
    token-major transpose runs once, after normalization, optionally in a
    narrower compute_dtype (pass jnp.bfloat16 in bf16 training steps —
    targets are ~N(0,1), well inside bf16 range; stats stay f32).
    """
    x = clip.astype(jnp.float32)
    if input_normalized:
        x = unnormalize_clip(x)
    B, T, H, W, C = x.shape
    p0, p = tubelet_size, patch_size
    t, h, w = T // p0, H // p, W // p
    x8 = x.reshape(B, t, p0, h, p, w, p, C)  # pure reshape, no movement
    if normalize_target:
        mean = jnp.mean(x8, axis=(2, 4, 6), keepdims=True)
        n = p0 * p * p
        var = jnp.var(x8, axis=(2, 4, 6), keepdims=True) * (n / (n - 1))
        x8 = (x8 - mean) / (jnp.sqrt(var) + 1e-6)
    x8 = x8.astype(compute_dtype)
    x8 = x8.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B,t,h,w,p0,p1,p2,C)
    return x8.reshape(B, t * h * w, p0 * p * p * C)


def patchify_flat(
    clip: Array, patch_size: int = 16, tubelet_size: int = 2
) -> Array:
    """(B, T, H, W, C) -> (B, N, p0*p*p*C) token-major flat patch rows,
    channel fastest — the '(p c)' layout of the reference targets AND the
    input the PatchEmbed matmul consumes.

    This is the ONE layout transpose of the pretrain step: both the
    encoder embedding and the reconstruction targets read its output
    (previously each side paid its own 8-D transpose, and the target
    stats reduced over strided axes — ~17 ms/step at B=48 on v5e)."""
    B, T, H, W, C = clip.shape
    p0, p = tubelet_size, patch_size
    t, h, w = T // p0, H // p, W // p
    # Formulation A/B'd on v5e at the ViT-B geometry (B=48 full step),
    # losers deleted (full history in docs/PERF.md):
    #   7-D with (p2, C) pre-merged   123.05 ms  <- this implementation
    #   8-D canonical                 124.0
    #   (B, t) leading-merge 6-D      128.4
    #   lax.reshape w/ dimensions     122.5 (neutral, r4 full-step A/B)
    #   i32-pair bitcast transpose    140.4  (breaks producer fusion)
    #   two-permute split (round 1)   130.5 vs 130.2 (same schedule)
    x = clip.reshape(B, t, p0, h, p, w, p * C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # (B,t,h,w,p0,p1,p2C)
    return x.reshape(B, t * h * w, p0 * p * p * C)


def masked_normalized_targets(
    tokens_pix: Array,
    mask_indices: Array,
    *,
    channels: int = 3,
    normalize_target: bool = True,
    input_normalized: bool = True,
    compute_dtype=jnp.float32,
    mean: Tuple[float, ...] = constants.IMAGENET_DEFAULT_MEAN,
    std: Tuple[float, ...] = constants.IMAGENET_DEFAULT_STD,
) -> Array:
    """Reconstruction targets from flat patch rows, masked positions only.

    tokens_pix: (B, N, D=P*C) from patchify_flat (ImageNet-normalized
    pixels unless input_normalized=False); mask_indices: (B, M).

    Same math as normalized_pixel_targets (engine_for_pretraining.py:
    43-63: un-normalize, per-patch per-channel mean / unbiased std + 1e-6)
    but TPU-shaped: gather the masked rows FIRST, un-normalize via a
    (D,)-vector affine, and compute the per-channel sums with thin
    matmuls against a channel-selector matrix — contiguous-lane work
    instead of stride-C reductions."""
    # keep the gather in the input dtype (bf16 in bf16 training steps:
    # half the HBM traffic of an f32 upcast); all statistics accumulate
    # in f32 regardless (preferred_element_type on the selector matmuls)
    wdt = tokens_pix.dtype if tokens_pix.dtype == jnp.bfloat16 \
        else _wide(tokens_pix.dtype)
    g = jnp.take_along_axis(
        tokens_pix, mask_indices[..., None], axis=1
    ).astype(wdt)  # (B, M, D)
    return normalize_patch_rows(
        g,
        channels=channels,
        normalize_target=normalize_target,
        input_normalized=input_normalized,
        compute_dtype=compute_dtype,
        mean=mean,
        std=std,
    )


def normalize_patch_rows(
    g: Array,
    *,
    channels: int = 3,
    normalize_target: bool = True,
    input_normalized: bool = True,
    compute_dtype=jnp.float32,
    mean: Tuple[float, ...] = constants.IMAGENET_DEFAULT_MEAN,
    std: Tuple[float, ...] = constants.IMAGENET_DEFAULT_STD,
) -> Array:
    """Per-patch per-channel target normalization of gathered pixel rows
    g (B, M, D), channel fastest (see masked_normalized_targets)."""
    D = g.shape[-1]
    npos = D // channels
    acc = _wide(g.dtype)  # f32 accumulation; f64 callers stay f64
    wdt = g.dtype if g.dtype == jnp.bfloat16 else acc
    g = g.astype(wdt)
    if input_normalized:
        s_vec = jnp.tile(jnp.asarray(std, wdt), npos)
        m_vec = jnp.tile(jnp.asarray(mean, wdt), npos)
        g = g * s_vec + m_vec
    if not normalize_target:
        return g.astype(compute_dtype)
    # channel selector: sel[d, c] = 1 iff d % channels == c
    sel = jnp.asarray(
        (jnp.arange(D)[:, None] % channels)
        == jnp.arange(channels)[None, :],
        wdt,
    )
    sums = jnp.einsum("bmd,dc->bmc", g, sel,
                      preferred_element_type=acc)
    sqs = jnp.einsum("bmd,dc->bmc",
                     (g.astype(acc) * g).astype(wdt), sel,
                     preferred_element_type=acc)
    mu = sums / npos
    var = (sqs - npos * mu * mu) / (npos - 1)  # unbiased
    denom = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-6
    # broadcast the (B, M, C) stats back over D with the same selector
    # (one exact matmul — each row of sel has a single 1) instead of a
    # (B, M, npos, C) reshape: the 4-D view forced XLA into two
    # full-size layout copies around the sub/div at the ViT-B geometry
    # (measured: selector broadcast 131.2 ms step vs 134.5 for the 4-D
    # reshape and 134.7 for normalizing inside the loss). The broadcast
    # tensors materialize in compute_dtype (bf16 in bf16 steps — the
    # per-channel stats are exact f32; only their D-wide broadcast
    # narrows), halving their HBM traffic.
    # (The 4-D reshape stat-broadcast alternative measured slower twice
    # — 134.5 vs 131.2 ms r2, 127.1 vs 122.7 ms r3 — and was deleted;
    # history in docs/PERF.md.)
    fsel = sel.astype(acc)
    if compute_dtype == jnp.bfloat16:
        # fold the normalization into one fma: a = 1/denom, b = -mu/denom
        # on the tiny (B, M, C) stats, then out = g*a_d + b_d — replaces
        # the full-size (B, M, D) subtract + DIVIDE (divides cost ~4x a
        # multiply on the VPU) with a single fused multiply-add. bf16
        # targets only; the f32/f64 parity path keeps the exact sub/div.
        a = 1.0 / denom
        b = -mu * a
        a_d = jnp.einsum("bmc,dc->bmd", a, fsel,
                         preferred_element_type=acc
                         ).astype(compute_dtype)
        b_d = jnp.einsum("bmc,dc->bmd", b, fsel,
                         preferred_element_type=acc
                         ).astype(compute_dtype)
        out = g.astype(acc) * a_d.astype(acc) + b_d.astype(acc)
        return out.astype(compute_dtype)
    mu_d = jnp.einsum("bmc,dc->bmd", mu, fsel,
                      preferred_element_type=acc
                      ).astype(compute_dtype)
    denom_d = jnp.einsum("bmc,dc->bmd", denom, fsel,
                         preferred_element_type=acc
                         ).astype(compute_dtype)
    out = ((g.astype(acc) - mu_d.astype(acc))
           / denom_d.astype(acc))
    return out.astype(compute_dtype)


def gather_masked_targets(
    targets: Array, mask_indices: Array
) -> Array:
    """Gather per-token targets at masked positions.

    targets: (B, N, D); mask_indices: (B, M) int32 (ascending masked
    positions, from mofo_tpu.ops.masking.mask_to_indices). Returns (B, M, D).
    Equivalent to the reference's boolean-index labels =
    videos_patch[bool_masked_pos].reshape(B, -1, C) — tube masking guarantees
    an equal count per sample, which is what makes the static gather valid.
    """
    return jnp.take_along_axis(targets, mask_indices[..., None], axis=1)


def masked_mse_loss(
    pred: Array, target: Array, weights: Optional[Array] = None
) -> Array:
    """Mean squared error over predicted masked tokens.

    pred, target: (B, M, D). With weights=None this is nn.MSELoss()
    (engine_for_pretraining.py:27,67). `weights` (B, M) enables the MOFO
    motion-weighted loss variant (the reference's train_one_epoch_BB accepts
    a loss_weight but ships with plain mean MSE — engine_for_pretraining.py:
    288-304; we expose the intended capability).
    """
    acc = _wide(jnp.result_type(pred.dtype, target.dtype))
    err = jnp.square(pred.astype(acc) - target.astype(acc))
    if weights is None:
        return jnp.mean(err)
    w = weights.astype(acc)[..., None]
    return jnp.sum(err * w) / (jnp.sum(w) * err.shape[-1] + 1e-12)
