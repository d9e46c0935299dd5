"""Patchify/targets: roundtrip, ordering, and golden parity against a torch/
einops transcription of the reference target construction
(engine_for_pretraining.py:43-63)."""

import einops
import jax
import jax.numpy as jnp
import numpy as np
import torch

from mofo_tpu.core import constants
from mofo_tpu.ops import masking, patchify


def _random_clip(B=2, T=4, H=32, W=32, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(B, T, H, W, 3).astype(np.float32)


class TestPatchify:
    def test_roundtrip(self):
        clip = jnp.asarray(_random_clip())
        p = patchify.patchify(clip, patch_size=16, tubelet_size=2)
        assert p.shape == (2, 2 * 2 * 2, 2 * 16 * 16, 3)
        back = patchify.unpatchify(p, t=2, h=2, w=2)
        np.testing.assert_allclose(np.asarray(back), np.asarray(clip))

    def test_matches_einops_reference_rearrange(self):
        clip = _random_clip()
        ours = np.asarray(patchify.patchify(jnp.asarray(clip)))
        # reference: 'b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c'
        ref = einops.rearrange(
            torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
            "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c",
            p0=2,
            p1=16,
            p2=16,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_normalized_targets_golden_vs_torch(self):
        # transcription of engine_for_pretraining.py:43-63 in torch
        clip = _random_clip(B=2, T=4, H=32, W=32, seed=3)
        mean = torch.as_tensor(constants.IMAGENET_DEFAULT_MEAN)
        std = torch.as_tensor(constants.IMAGENET_DEFAULT_STD)
        # our input convention: channel-last normalized clip
        normed = (clip - np.asarray(mean)) / np.asarray(std)

        videos = torch.from_numpy(normed).permute(0, 4, 1, 2, 3)
        unnorm = videos * std[None, :, None, None, None] + mean[
            None, :, None, None, None
        ]
        sq = einops.rearrange(
            unnorm,
            "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c",
            p0=2,
            p1=16,
            p2=16,
        )
        ref = (sq - sq.mean(dim=-2, keepdim=True)) / (
            sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6
        )
        ref = einops.rearrange(ref, "b n p c -> b n (p c)").numpy()

        ours = np.asarray(
            patchify.normalized_pixel_targets(jnp.asarray(normed))
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_unnormalized_targets(self):
        clip = _random_clip(seed=5)
        ours = np.asarray(
            patchify.normalized_pixel_targets(
                jnp.asarray(clip), normalize_target=False,
                input_normalized=False,
            )
        )
        ref = einops.rearrange(
            torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
            "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2 c)",
            p0=2,
            p1=16,
            p2=16,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_gather_masked_targets_matches_boolean_indexing(self):
        clip = jnp.asarray(_random_clip(B=3, T=16, H=224, W=224))
        targets = patchify.normalized_pixel_targets(
            clip, input_normalized=False
        )
        mask = masking.tube_mask(jax.random.PRNGKey(0), 3)
        _, mask_idx = masking.mask_to_indices(mask, 8 * 176)
        ours = np.asarray(patchify.gather_masked_targets(targets, mask_idx))
        tgt = np.asarray(targets)
        m = np.asarray(mask)
        for b in range(3):
            np.testing.assert_allclose(ours[b], tgt[b][m[b]], atol=1e-7)

    def test_masked_mse_matches_plain_mean(self):
        rng = np.random.RandomState(0)
        pred = jnp.asarray(rng.rand(2, 10, 8).astype(np.float32))
        tgt = jnp.asarray(rng.rand(2, 10, 8).astype(np.float32))
        ours = float(patchify.masked_mse_loss(pred, tgt))
        ref = float(np.mean((np.asarray(pred) - np.asarray(tgt)) ** 2))
        assert abs(ours - ref) < 1e-7

    def test_weighted_mse(self):
        pred = jnp.ones((1, 4, 2))
        tgt = jnp.zeros((1, 4, 2))
        w = jnp.array([[1.0, 1.0, 0.0, 0.0]])
        loss = float(patchify.masked_mse_loss(pred, tgt, weights=w))
        assert abs(loss - 1.0) < 1e-6


class TestMaskedNormalizedTargets:
    """The fast path (patchify_flat + masked_normalized_targets) must
    reproduce normalized_pixel_targets + gather exactly (same math,
    TPU-shaped op order)."""

    def test_matches_reference_path(self):
        rng = np.random.RandomState(7)
        clip = jnp.asarray(
            rng.rand(2, 8, 64, 64, 3).astype(np.float32) * 2.0 - 0.5
        )
        old = patchify.normalized_pixel_targets(clip)
        mask = masking.tube_mask(
            jax.random.PRNGKey(3), 2, temporal_positions=4,
            patches_per_frame=16, mask_ratio=0.75,
        )
        _, mask_idx = masking.mask_to_indices(mask, 4 * 12)
        ref = np.asarray(patchify.gather_masked_targets(old, mask_idx))

        tokens = patchify.patchify_flat(clip)
        new = np.asarray(
            patchify.masked_normalized_targets(tokens, mask_idx)
        )
        np.testing.assert_allclose(new, ref, atol=2e-5, rtol=2e-5)

    def test_no_norm_matches(self):
        rng = np.random.RandomState(8)
        clip = jnp.asarray(rng.rand(1, 4, 32, 32, 3).astype(np.float32))
        old = patchify.normalized_pixel_targets(
            clip, normalize_target=False, input_normalized=False
        )
        idx = jnp.asarray([[0, 3, 5]], jnp.int32)
        ref = np.asarray(patchify.gather_masked_targets(old, idx))
        tokens = patchify.patchify_flat(clip)
        new = np.asarray(
            patchify.masked_normalized_targets(
                tokens, idx, normalize_target=False, input_normalized=False
            )
        )
        np.testing.assert_allclose(new, ref, atol=1e-7)

    def test_patchify_flat_matches_patchify(self):
        rng = np.random.RandomState(9)
        clip = jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32))
        a = np.asarray(patchify.patchify_flat(clip))
        b = np.asarray(patchify.patchify(clip))
        np.testing.assert_array_equal(a, b.reshape(a.shape))

    def test_bf16_targets_close_to_f32(self):
        """The bf16 fast path (bf16 patchify transpose + bf16 gather +
        f32-accumulated stats) must stay within bf16 noise of the exact
        f32 targets — the pretrain step uses it for every bf16 run."""
        rng = np.random.RandomState(11)
        clip = jnp.asarray(
            rng.rand(2, 4, 64, 64, 3).astype(np.float32) * 2.0 - 0.5
        )
        idx = jnp.asarray([[0, 3, 7, 12], [1, 5, 9, 15]], jnp.int32)
        exact = np.asarray(
            patchify.masked_normalized_targets(
                patchify.patchify_flat(clip), idx
            )
        )
        fast = np.asarray(
            patchify.masked_normalized_targets(
                patchify.patchify_flat(clip.astype(jnp.bfloat16)),
                idx, compute_dtype=jnp.bfloat16,
            )
        ).astype(np.float32)
        # normalized targets are ~N(0,1); bf16 pixel rounding plus the
        # bf16 stat broadcast keeps the error at the few-percent level
        err = np.abs(fast - exact)
        assert np.median(err) < 0.02, np.median(err)
        assert np.percentile(err, 99) < 0.2, np.percentile(err, 99)

