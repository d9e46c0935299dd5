"""Checkpoint roundtrip, auto-resume selection, torch import mapping, and
pretrain -> finetune weight surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mofo_tpu.models import create_model
from mofo_tpu.train import checkpoint as ckpt
from mofo_tpu.train.train_state import TrainState


def _tiny_pretrain_params():
    model = create_model(
        "pretrain_videomae_base_patch16_224",
        img_size=32,
        num_frames=4,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        decoder_embed_dim=16,
        decoder_depth=1,
        decoder_num_heads=2,
        decoder_num_classes=1536,
    )
    clip = jnp.zeros((1, 4, 32, 32, 3))
    vis = jnp.zeros((1, 4), jnp.int32)
    msk = jnp.zeros((1, 4), jnp.int32)
    return model.init(jax.random.PRNGKey(0), clip, vis, msk)["params"]


def _flax_to_torch_state_dict(params):
    """Inverse of the import shim, producing reference-style names
    (modeling_pretrain.py attribute paths)."""
    sd = {}

    def add_block(prefix, torch_prefix, tree):
        for i_name, sub in tree.items():
            if not i_name.startswith("blocks_"):
                continue
            i = i_name.split("_")[-1]
            tp = f"{torch_prefix}blocks.{i}."
            sd[tp + "norm1.weight"] = torch.tensor(
                np.asarray(sub["norm1"]["scale"]))
            sd[tp + "norm1.bias"] = torch.tensor(
                np.asarray(sub["norm1"]["bias"]))
            sd[tp + "norm2.weight"] = torch.tensor(
                np.asarray(sub["norm2"]["scale"]))
            sd[tp + "norm2.bias"] = torch.tensor(
                np.asarray(sub["norm2"]["bias"]))
            sd[tp + "attn.qkv.weight"] = torch.tensor(
                np.asarray(sub["attn"]["qkv_kernel"]).T)
            sd[tp + "attn.q_bias"] = torch.tensor(
                np.asarray(sub["attn"]["q_bias"]))
            sd[tp + "attn.v_bias"] = torch.tensor(
                np.asarray(sub["attn"]["v_bias"]))
            sd[tp + "attn.proj.weight"] = torch.tensor(
                np.asarray(sub["attn"]["proj_kernel"]).T)
            sd[tp + "attn.proj.bias"] = torch.tensor(
                np.asarray(sub["attn"]["proj_bias"]))
            sd[tp + "mlp.fc1.weight"] = torch.tensor(
                np.asarray(sub["mlp"]["fc1"]["kernel"]).T)
            sd[tp + "mlp.fc1.bias"] = torch.tensor(
                np.asarray(sub["mlp"]["fc1"]["bias"]))
            sd[tp + "mlp.fc2.weight"] = torch.tensor(
                np.asarray(sub["mlp"]["fc2"]["kernel"]).T)
            sd[tp + "mlp.fc2.bias"] = torch.tensor(
                np.asarray(sub["mlp"]["fc2"]["bias"]))

    enc = params["encoder"]
    k = np.asarray(enc["patch_embed"]["kernel"])  # (p0*p1*p2*C, D)
    D = k.shape[-1]
    k5 = k.reshape(2, 16, 16, 3, D).transpose(4, 3, 0, 1, 2)
    sd["encoder.patch_embed.proj.weight"] = torch.tensor(k5)
    sd["encoder.patch_embed.proj.bias"] = torch.tensor(
        np.asarray(enc["patch_embed"]["bias"]))
    add_block(None, "encoder.", enc)
    sd["encoder.norm.weight"] = torch.tensor(np.asarray(enc["norm"]["scale"]))
    sd["encoder.norm.bias"] = torch.tensor(np.asarray(enc["norm"]["bias"]))
    sd["encoder_to_decoder.weight"] = torch.tensor(
        np.asarray(params["encoder_to_decoder"]["kernel"]).T)
    sd["mask_token"] = torch.tensor(np.asarray(params["mask_token"]))
    dec = params["decoder"]
    add_block(None, "decoder.", dec)
    sd["decoder.norm.weight"] = torch.tensor(np.asarray(dec["norm"]["scale"]))
    sd["decoder.norm.bias"] = torch.tensor(np.asarray(dec["norm"]["bias"]))
    sd["decoder.head.weight"] = torch.tensor(
        np.asarray(dec["head"]["kernel"]).T)
    sd["decoder.head.bias"] = torch.tensor(np.asarray(dec["head"]["bias"]))
    return sd


class TestOrbaxRoundtrip:
    def test_save_restore(self, tmp_path):
        import optax

        params = _tiny_pretrain_params()
        tx = optax.adam(1e-3)
        state = TrainState.create(params, tx)
        path = ckpt.save_checkpoint(str(tmp_path), state, step=3)
        restored = ckpt.restore_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_auto_resume_picks_highest(self, tmp_path):
        import optax

        params = {"w": jnp.ones((2,))}
        state = TrainState.create(params, optax.sgd(0.1))
        for s in [1, 5, 3]:
            ckpt.save_checkpoint(
                str(tmp_path), state.replace(step=jnp.asarray(s)), step=s
            )
        restored, step = ckpt.auto_resume(str(tmp_path), state)
        assert step == 5
        assert int(restored.step) == 5

    def test_auto_resume_empty(self, tmp_path):
        assert ckpt.auto_resume(str(tmp_path), None) is None


class TestTorchImport:
    def test_pretrain_roundtrip(self):
        params = _tiny_pretrain_params()
        sd = _flax_to_torch_state_dict(params)
        imported = ckpt.import_torch_pretrain({"model": sd})
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
        # every original leaf should be reproduced exactly
        from mofo_tpu.train.optim import path_names

        b_by_name = {
            tuple(path_names(p)): v
            for p, v in jax.tree_util.tree_flatten_with_path(imported)[0]
        }
        for path, leaf in flat_a:
            names = tuple(path_names(path))
            assert names in b_by_name, f"missing {names}"
            np.testing.assert_allclose(
                np.asarray(leaf), b_by_name[names], atol=1e-7
            )

    def test_finetune_surgery(self):
        params = _tiny_pretrain_params()
        cls_model = create_model(
            "vit_base_patch16_224",
            img_size=32,
            all_frames=4,
            embed_dim=32,
            depth=2,
            num_heads=2,
            num_classes=7,
        )
        cls_params = cls_model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 4, 32, 32, 3))
        )["params"]
        merged = ckpt.finetune_init_from_pretrain(
            cls_params, params["encoder"]
        )
        np.testing.assert_allclose(
            np.asarray(merged["blocks_0"]["attn"]["qkv_kernel"]),
            np.asarray(params["encoder"]["blocks_0"]["attn"]["qkv_kernel"]),
        )
        np.testing.assert_allclose(
            np.asarray(merged["patch_embed"]["kernel"]),
            np.asarray(params["encoder"]["patch_embed"]["kernel"]),
        )
        # head stays fresh
        np.testing.assert_allclose(
            np.asarray(merged["head"]["kernel"]),
            np.asarray(cls_params["head"]["kernel"]),
        )
