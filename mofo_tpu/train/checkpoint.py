"""Checkpointing: orbax save/restore with auto-resume, a PyTorch-checkpoint
import shim, and pretrain -> finetune weight surgery.

Reference behavior being covered (utils.py:411-496,
run_class_finetuning.py:350-411):
  - checkpoint-<epoch> directories, --auto_resume picks the highest epoch
  - saved payload: params, optimizer state, step/epoch, (ema)
  - finetune init from a pretrain checkpoint: strip the 'encoder.' prefix,
    drop the reconstruction head / mismatched classifier head, interpolate
    pos embeddings on resolution change. Our positional tables are computed
    (frozen sin-cos at any geometry), so the interpolation step vanishes:
    changing resolution regenerates the table exactly.
  - torch .pth import so published MOFO/VideoMAE weights load for parity
    runs (torch is CPU-only in this image; the shim converts to numpy once).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

Params = Any


# ---------------------------------------------------------------------------
# Orbax
# ---------------------------------------------------------------------------


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"checkpoint-{step}")


def save_checkpoint(
    ckpt_dir: str, state: Any, step: int, name: Optional[str] = None
) -> str:
    """Save a train state (or any pytree) as checkpoint-<step>/."""
    path = (
        os.path.join(os.path.abspath(ckpt_dir), name)
        if name
        else _ckpt_path(ckpt_dir, step)
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[str, int]]:
    """Find checkpoint-<n> with the highest n (utils.py auto_resume glob)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for entry in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", entry)
        if m:
            n = int(m.group(1))
            if best is None or n > best[1]:
                best = (os.path.join(ckpt_dir, entry), n)
    return best


def auto_resume(ckpt_dir: str, template: Any) -> Optional[Tuple[Any, int]]:
    found = latest_checkpoint(ckpt_dir)
    if found is None:
        return None
    path, step = found
    return restore_checkpoint(path, template), step


# ---------------------------------------------------------------------------
# Torch .pth import
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_block(dst: Dict, prefix: Tuple[str, ...], name: str, t) -> bool:
    """Map one torch block param 'blocks.N.<rest>' -> flax blocks_N tree.
    Returns True if handled."""
    m = re.match(r"blocks\.(\d+)\.(.+)", name)
    if not m:
        return False
    bi, rest = int(m.group(1)), m.group(2)
    base = prefix + (f"blocks_{bi}",)
    mapping = {
        "norm1.weight": ("norm1", "scale"),
        "norm1.bias": ("norm1", "bias"),
        "norm2.weight": ("norm2", "scale"),
        "norm2.bias": ("norm2", "bias"),
        "attn.q_bias": ("attn", "q_bias"),
        "attn.v_bias": ("attn", "v_bias"),
        "attn.proj.bias": ("attn", "proj_bias"),
        "mlp.fc1.bias": ("mlp", "fc1", "bias"),
        "mlp.fc2.bias": ("mlp", "fc2", "bias"),
        "gamma_1": ("gamma_1",),
        "gamma_2": ("gamma_2",),
    }
    transposed = {
        "attn.qkv.weight": ("attn", "qkv_kernel"),
        "attn.proj.weight": ("attn", "proj_kernel"),
        "mlp.fc1.weight": ("mlp", "fc1", "kernel"),
        "mlp.fc2.weight": ("mlp", "fc2", "kernel"),
    }
    if rest in mapping:
        _set(dst, base + mapping[rest], _np(t))
    elif rest in transposed:
        _set(dst, base + transposed[rest], _np(t).T)
    else:
        return False
    return True


def _convert_patch_embed(dst, prefix, name, t) -> bool:
    if name == "patch_embed.proj.weight":
        # torch conv (D, C, p0, p1, p2) -> flax kernel (p0*p1*p2*C, D),
        # patch vector order (p0, p1, p2, c) channel fastest
        w = _np(t)  # (D, C, p0, p1, p2)
        w = np.transpose(w, (2, 3, 4, 1, 0))  # (p0, p1, p2, C, D)
        _set(dst, prefix + ("patch_embed", "kernel"),
             w.reshape(-1, w.shape[-1]))
        return True
    if name == "patch_embed.proj.bias":
        _set(dst, prefix + ("patch_embed", "bias"), _np(t))
        return True
    return False


def import_torch_pretrain(state_dict) -> Dict:
    """Torch MOFO/VideoMAE pretrain checkpoint -> flax param tree for
    PretrainVisionTransformer. Accepts the raw state_dict (possibly nested
    under 'model' / 'module')."""
    sd = state_dict
    for key in ("model", "module"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    params: Dict = {}
    unmatched = []
    for name, t in sd.items():
        if name.startswith("encoder."):
            rest = name[len("encoder."):]
            if _convert_patch_embed(params, ("encoder",), rest, t):
                continue
            if _convert_block(params, ("encoder",), rest, t):
                continue
            if rest == "norm.weight":
                _set(params, ("encoder", "norm", "scale"), _np(t))
            elif rest == "norm.bias":
                _set(params, ("encoder", "norm", "bias"), _np(t))
            else:
                unmatched.append(name)
        elif name.startswith("decoder."):
            rest = name[len("decoder."):]
            if _convert_block(params, ("decoder",), rest, t):
                continue
            if rest == "norm.weight":
                _set(params, ("decoder", "norm", "scale"), _np(t))
            elif rest == "norm.bias":
                _set(params, ("decoder", "norm", "bias"), _np(t))
            elif rest == "head.weight":
                _set(params, ("decoder", "head", "kernel"), _np(t).T)
            elif rest == "head.bias":
                _set(params, ("decoder", "head", "bias"), _np(t))
            else:
                unmatched.append(name)
        elif name == "encoder_to_decoder.weight":
            _set(params, ("encoder_to_decoder", "kernel"), _np(t).T)
        elif name == "mask_token":
            _set(params, ("mask_token",), _np(t))
        elif "pos_embed" in name:
            pass  # frozen sin-cos tables are recomputed, not stored
        else:
            unmatched.append(name)
    if unmatched:
        print(f"[import_torch_pretrain] unmatched keys: {unmatched}")
    return params


def import_torch_finetune(state_dict) -> Dict:
    """Torch finetuned classifier checkpoint -> flax VisionTransformer
    param tree (handles the reference's 'backbone.'/'encoder.' prefixes,
    run_class_finetuning.py:360-377)."""
    sd = state_dict
    for key in ("model", "module"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    # strip backbone./encoder. prefixes
    clean = {}
    for name, t in sd.items():
        for pre in ("backbone.", "encoder."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        clean[name] = t
    params: Dict = {}
    unmatched = []
    simple = {
        "fc_norm.weight": ("fc_norm", "scale"),
        "fc_norm.bias": ("fc_norm", "bias"),
        "norm.weight": ("norm", "scale"),
        "norm.bias": ("norm", "bias"),
        "head.bias": ("head", "bias"),
    }
    for name, t in clean.items():
        if _convert_patch_embed(params, (), name, t):
            continue
        if _convert_block(params, (), name, t):
            continue
        if name in simple:
            _set(params, simple[name], _np(t))
        elif name == "head.weight":
            _set(params, ("head", "kernel"), _np(t).T)
        elif "pos_embed" in name:
            pass
        else:
            unmatched.append(name)
    if unmatched:
        print(f"[import_torch_finetune] unmatched keys: {unmatched}")
    return params


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Pretrain -> finetune surgery
# ---------------------------------------------------------------------------


def finetune_init_from_pretrain(
    classifier_params: Params, pretrain_encoder: Dict
) -> Params:
    """Initialize a classifier param tree from a pretrain encoder tree.

    Mirrors run_class_finetuning.py:350-383: copy patch_embed + blocks +
    (final norm when present), keep the fresh fc_norm/head. The classifier
    tree may nest the backbone under 'backbone' (BB-focused model).
    """
    params = jax.tree.map(lambda x: x, classifier_params)  # shallow copy
    target = params.get("backbone", params)
    copied, skipped = [], []
    for key, sub in pretrain_encoder.items():
        if key in target:
            target[key] = jax.tree.map(
                lambda dst, src: jnp.asarray(src, dtype=dst.dtype),
                target[key],
                sub,
            )
            copied.append(key)
        else:
            skipped.append(key)
    print(
        f"[finetune_init] copied {len(copied)} encoder entries; "
        f"skipped (not in classifier): {skipped}"
    )
    return params
