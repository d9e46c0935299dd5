"""Golden forward-pass parity: flax models vs a PyTorch transcription of the
reference math, with identical weights. Validates the static-gather token
dropping, patch-embed-as-matmul, attention numerics, and pooling paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mofo_tpu.models import create_model
from mofo_tpu.ops import masking

import torch_ref

GEOM = dict(img_size=32, num_frames=4, patch=16, tubelet=2)
# tokens: 2 temporal x 2 x 2 spatial = 8; mask_ratio 0.5 -> 2 masked/row


def _clip(B=2, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, GEOM["num_frames"], GEOM["img_size"],
                     GEOM["img_size"], 3).astype(np.float32)


def _to_torch_clip(clip):
    return torch.from_numpy(clip).permute(0, 4, 1, 2, 3)


class TestPretrainParity:
    def test_forward_matches_torch(self):
        B = 2
        model = create_model(
            "pretrain_videomae_base_patch16_224",
            img_size=GEOM["img_size"],
            num_frames=GEOM["num_frames"],
            encoder_embed_dim=64,
            encoder_depth=2,
            encoder_num_heads=2,
            decoder_embed_dim=32,
            decoder_depth=2,
            decoder_num_heads=2,
            decoder_num_classes=GEOM["tubelet"] * GEOM["patch"] ** 2 * 3,
        )
        clip = _clip(B)
        mask = masking.tube_mask(
            jax.random.PRNGKey(0),
            B,
            temporal_positions=2,
            patches_per_frame=4,
            mask_ratio=0.5,
        )
        n_masked = 2 * masking.num_masked_per_frame(4, 0.5)
        vis_idx, mask_idx = masking.mask_to_indices(mask, n_masked)
        params = model.init(
            jax.random.PRNGKey(1), jnp.asarray(clip), vis_idx, mask_idx
        )
        ours = np.asarray(
            model.apply(params, jnp.asarray(clip), vis_idx, mask_idx)
        )

        ref = torch_ref.RefPretrain(
            img_size=GEOM["img_size"],
            patch_size=GEOM["patch"],
            enc_dim=64,
            enc_depth=2,
            enc_heads=2,
            dec_dim=32,
            dec_depth=2,
            dec_heads=2,
            dec_classes=GEOM["tubelet"] * GEOM["patch"] ** 2 * 3,
            num_frames=GEOM["num_frames"],
            tubelet_size=GEOM["tubelet"],
        )
        torch_ref.load_pretrain(ref, params["params"])
        ref.eval()
        with torch.no_grad():
            theirs = ref(
                _to_torch_clip(clip), torch.from_numpy(np.asarray(mask))
            ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


class TestClassifierParity:
    def test_forward_matches_torch(self):
        model = create_model(
            "vit_base_patch16_224",
            img_size=GEOM["img_size"],
            all_frames=GEOM["num_frames"],
            embed_dim=64,
            depth=2,
            num_heads=2,
            num_classes=11,
            init_scale=1.0,
        )
        clip = _clip(3, seed=4)
        params = model.init(jax.random.PRNGKey(2), jnp.asarray(clip))
        ours = np.asarray(model.apply(params, jnp.asarray(clip)))

        ref = torch_ref.RefClassifier(
            img_size=GEOM["img_size"],
            patch_size=GEOM["patch"],
            dim=64,
            depth=2,
            heads=2,
            num_classes=11,
            num_frames=GEOM["num_frames"],
            tubelet_size=GEOM["tubelet"],
        )
        torch_ref.load_classifier(ref, params["params"])
        ref.eval()
        with torch.no_grad():
            theirs = ref(_to_torch_clip(clip)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


class TestBBFusingParity:
    """The vectorized fusing modes vs a ragged-loop transcription of
    modeling_finetune.py:552-585 operating on the same token features."""

    def _fused_ref(self, tokens, in_map, mode):
        out = []
        for i in range(tokens.shape[0]):
            x = torch.from_numpy(tokens[i])
            m = torch.from_numpy(in_map[i])
            if m.sum() == 0:
                out.append(x.mean(0))
                continue
            in_bbx = x[m]
            out_bbx = x[~m]
            if mode == "weighted_mean":
                out.append((in_bbx.mean(0) * 1 + out_bbx.mean(0) * 0.5) / 2)
        return torch.stack(out).numpy()

    def test_weighted_mean_matches_ragged_loop(self):
        from mofo_tpu.models.bb_focused import _masked_mean

        rng = np.random.RandomState(0)
        tokens = rng.randn(3, 8, 6).astype(np.float32)
        in_map = np.array(
            [
                [1, 0, 1, 0, 0, 0, 0, 0],
                [1, 1, 1, 1, 1, 1, 1, 0],
                [0, 0, 0, 0, 0, 0, 0, 0],  # empty -> plain mean fallback
            ],
            dtype=bool,
        )
        t = jnp.asarray(tokens)
        m = jnp.asarray(in_map)
        in_mean = _masked_mean(t, m)
        out_mean = _masked_mean(t, ~m)
        fused = (in_mean * 1.0 + out_mean * 0.5) / 2.0
        fused = jnp.where(
            jnp.any(m, axis=1)[:, None], fused, jnp.mean(t, axis=1)
        )
        ref = self._fused_ref(tokens, in_map, "weighted_mean")
        np.testing.assert_allclose(np.asarray(fused), ref, atol=1e-6)

    def test_soft_attention_is_near_mean(self):
        """Documented reference quirk: SoftAttention with step_dim=1 reduces
        to ~the plain token mean (layers.py docstring)."""
        from mofo_tpu.models.layers import SoftAttention

        rng = np.random.RandomState(1)
        tokens = jnp.asarray(rng.randn(2, 10, 6).astype(np.float32))
        m = jnp.asarray(np.ones((2, 10), bool))
        mod = SoftAttention(feature_dim=6)
        p = mod.init(jax.random.PRNGKey(0), tokens, m)
        out = np.asarray(mod.apply(p, tokens, m))
        np.testing.assert_allclose(
            out, np.asarray(tokens.mean(axis=1)), atol=1e-3
        )

    def test_token_in_box_map_matches_paint_and_pool(self):
        """token_in_box_map vs an emulation of the reference's painted-
        volume + patch_yab conv (modeling_finetune.py:591-630)."""
        from mofo_tpu.models.bb_focused import token_in_box_map

        B, T, H, W = 2, 4, 32, 32
        rng = np.random.RandomState(2)
        boxes = np.zeros((B, T, 4), np.int64)
        for b in range(B):
            for t in range(T):
                x1, y1 = rng.randint(0, W - 1), rng.randint(0, H - 1)
                boxes[b, t] = [
                    x1, y1,
                    rng.randint(x1 + 1, W + 1),
                    rng.randint(y1 + 1, H + 1),
                ]
        # paint indicator volume, then pool per token like patch_yab
        vol = np.zeros((B, T, H, W), np.float32)
        for b in range(B):
            for t in range(T):
                x1, y1, x2, y2 = boxes[b, t]
                vol[b, t, y1:y2, x1:x2] = 1
        # token (tt, j, k): sum over 2 frames x 16x16 pixels > 0
        v = vol.reshape(B, 2, 2, 2, 16, 2, 16)
        per_token = v.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, 2, 2, 2, -1)
        ref_map = (per_token.sum(-1) > 0).reshape(B, -1)

        ours = np.asarray(
            token_in_box_map(
                jnp.asarray(boxes.astype(np.float32)),
                tubelet_size=2,
                patches_per_side=2,
                patch_size=16,
            )
        )
        np.testing.assert_array_equal(ours, ref_map)
