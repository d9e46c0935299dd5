"""Model registry with reference-parity names.

The reference instantiates models through timm's registry
(`timm.models.create_model(name, **kwargs)`); we expose the same names
(modeling_pretrain.py:268-338, modeling_finetune.py:637-705) through a
plain dict. create_model(name, **overrides) returns a flax Module.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from mofo_tpu.models.bb_focused import VisionTransformerBBFocused
from mofo_tpu.models.classifier import VisionTransformer
from mofo_tpu.models.pretrain import PretrainVisionTransformer

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(fn: Callable[..., Any]) -> Callable[..., Any]:
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models():
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs: Any):
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {', '.join(list_models())}"
        )
    return _REGISTRY[name](**kwargs)


def _pretrain(enc_dim, enc_depth, enc_heads, dec_dim, dec_heads, **kwargs):
    cfg = dict(
        img_size=224,
        patch_size=16,
        encoder_embed_dim=enc_dim,
        encoder_depth=enc_depth,
        encoder_num_heads=enc_heads,
        decoder_num_classes=1536,
        decoder_embed_dim=dec_dim,
        decoder_num_heads=dec_heads,
        mlp_ratio=4.0,
        qkv_bias=True,
    )
    cfg.update(kwargs)  # explicit overrides win
    return PretrainVisionTransformer(**cfg)


# --- pretraining models (modeling_pretrain.py:268-338) ---------------------


@register_model
def pretrain_videomae_small_patch16_224(**kwargs):
    return _pretrain(384, 12, 6, 192, 3, **kwargs)


@register_model
def pretrain_videomae_base_patch16_224(**kwargs):
    return _pretrain(768, 12, 12, 384, 6, **kwargs)


@register_model
def pretrain_videomae_large_patch16_224(**kwargs):
    return _pretrain(1024, 24, 16, 512, 8, **kwargs)


@register_model
def pretrain_videomae_tiny_debug(**kwargs):
    """Rebuild-only CI preset (no reference counterpart): 2-block dim-64
    encoder + dim-32 decoder so the CLI e2e tests compile in seconds on
    a 1-core CPU host instead of minutes at ViT-B depth."""
    return _pretrain(64, 2, 2, 32, 2, **kwargs)


# --- finetuning models (modeling_finetune.py:637-705) ----------------------


def _vit(_embed_dim, _depth, _num_heads, _img_size=224, **kwargs):
    cfg = dict(
        img_size=_img_size,
        patch_size=16,
        embed_dim=_embed_dim,
        depth=_depth,
        num_heads=_num_heads,
        mlp_ratio=4.0,
        qkv_bias=True,
    )
    cfg.update(kwargs)  # explicit overrides win
    return VisionTransformer(**cfg)


@register_model
def vit_small_patch16_224(**kwargs):
    return _vit(384, 12, 6, **kwargs)


@register_model
def vit_base_patch16_224(**kwargs):
    return _vit(768, 12, 12, **kwargs)


@register_model
def vit_base_patch16_384(**kwargs):
    return _vit(768, 12, 12, _img_size=384, **kwargs)


@register_model
def vit_large_patch16_224(**kwargs):
    return _vit(1024, 24, 16, **kwargs)


@register_model
def vit_large_patch16_384(**kwargs):
    return _vit(1024, 24, 16, _img_size=384, **kwargs)


@register_model
def vit_large_patch16_512(**kwargs):
    return _vit(1024, 24, 16, _img_size=512, **kwargs)


@register_model
def vit_tiny_debug(**kwargs):
    """Rebuild-only CI preset (no reference counterpart): 2-block dim-64
    classifier for fast-compiling CLI e2e tests."""
    return _vit(64, 2, 2, **kwargs)


@register_model
def vit_base_patch16_224_feature_ext(**kwargs):
    # Same module; call with return_features=True (classifier.py docstring).
    kwargs.setdefault("num_classes", 0)
    return _vit(768, 12, 12, **kwargs)


@register_model
def vit_base_patch16_224_BB_focused(**kwargs):
    cfg = dict(
        img_size=224,
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        mlp_ratio=4.0,
        qkv_bias=True,
    )
    cfg.update(kwargs)
    return VisionTransformerBBFocused(**cfg)
