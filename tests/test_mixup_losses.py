"""Mixup/cutmix and loss parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mofo_tpu.ops.mixup import Mixup, one_hot_smooth
from mofo_tpu.train import losses


class TestOneHotSmooth:
    def test_values_match_reference_formula(self):
        # mixup.py:22-25: off = s/n, on = 1 - s + off
        t = jnp.array([0, 2])
        y = np.asarray(one_hot_smooth(t, 4, smoothing=0.1))
        off, on = 0.1 / 4, 1 - 0.1 + 0.1 / 4
        assert abs(y[0, 0] - on) < 1e-6 and abs(y[0, 1] - off) < 1e-6
        assert abs(y[1, 2] - on) < 1e-6


class TestMixup:
    def _batch(self, B=8, T=2, H=32, W=32):
        rng = np.random.RandomState(0)
        clips = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, B))
        return clips, labels

    def test_batch_mode_blend(self):
        clips, labels = self._batch()
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, mode="batch",
                    num_classes=5)
        out, soft = mix(jax.random.PRNGKey(0), clips, labels)
        assert out.shape == clips.shape and soft.shape == (8, 5)
        # targets sum to 1 (smoothed one-hot convex combination)
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)
        # mixed clip must be a convex combination of clip and its flip
        a, b = np.asarray(clips), np.asarray(jnp.flip(clips, 0))
        o = np.asarray(out)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        assert (o >= lo - 1e-5).all() and (o <= hi + 1e-5).all()

    def test_cutmix_pixels_from_partner(self):
        clips, labels = self._batch()
        mix = Mixup(mixup_alpha=0.0, cutmix_alpha=1.0, mode="batch",
                    num_classes=5)
        out, soft = mix(jax.random.PRNGKey(1), clips, labels)
        a = np.asarray(clips)
        b = np.asarray(jnp.flip(clips, 0))
        o = np.asarray(out)
        # every pixel equals either the original or the partner
        from_a = np.isclose(o, a, atol=1e-6)
        from_b = np.isclose(o, b, atol=1e-6)
        assert (from_a | from_b).all()
        # lam consistency: coefficient on the ORIGINAL label entry in the
        # soft target must equal 1 - (fraction of partner pixels)
        label0 = int(labels[0])
        label_partner = int(labels[-1])
        if label0 != label_partner:
            off, on = 0.1 / 5, 1 - 0.1 + 0.1 / 5
            lam = (float(soft[0, label0]) - off) / (on - off)
            frac_b = from_b[0].mean()
            if lam < 0.999:  # box actually applied
                assert abs((1 - lam) - frac_b) < 0.05, (lam, frac_b)

    def test_elem_mode_runs(self):
        clips, labels = self._batch()
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, mode="elem",
                    num_classes=5)
        out, soft = mix(jax.random.PRNGKey(2), clips, labels)
        assert out.shape == clips.shape
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)

    def test_pair_mode_runs(self):
        clips, labels = self._batch()
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, mode="pair",
                    num_classes=5)
        out, soft = mix(jax.random.PRNGKey(3), clips, labels)
        assert out.shape == clips.shape

    def test_prob_zero_disables(self):
        clips, labels = self._batch()
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, prob=0.0,
                    num_classes=5, label_smoothing=0.0)
        out, soft = mix(jax.random.PRNGKey(4), clips, labels)
        np.testing.assert_allclose(np.asarray(out), np.asarray(clips),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(soft),
            np.asarray(jax.nn.one_hot(labels, 5)),
            atol=1e-6,
        )

    def test_lam_distribution_beta(self):
        clips, _ = self._batch(B=4)
        labels = jnp.asarray([0, 1, 2, 3])  # partner labels all distinct
        mix = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, mode="batch",
                    num_classes=5, label_smoothing=0.0)
        lams = []
        for i in range(200):
            _, soft = mix(jax.random.PRNGKey(i), clips, labels)
            lams.append(float(np.asarray(soft[0]).max()))
        lams = np.array(lams)
        # Beta(0.8, 0.8) mixed with flip symmetry: mean of max(lam, 1-lam)
        # should be well inside (0.5, 1.0)
        assert 0.55 < lams.mean() < 0.99


class TestLosses:
    def test_soft_target_ce_vs_torch(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(4, 7).astype(np.float32)
        soft = rng.rand(4, 7).astype(np.float32)
        soft /= soft.sum(-1, keepdims=True)
        ours = float(losses.soft_target_cross_entropy(
            jnp.asarray(logits), jnp.asarray(soft)))
        tl = torch.from_numpy(logits)
        ts = torch.from_numpy(soft)
        ref = float(torch.sum(-ts * F.log_softmax(tl, dim=-1), dim=-1).mean())
        assert abs(ours - ref) < 1e-5

    def test_label_smoothing_ce_vs_torch(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(6, 9).astype(np.float32)
        targets = rng.randint(0, 9, 6)
        ours = float(losses.label_smoothing_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), 0.1))
        ref = float(F.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(targets),
            label_smoothing=0.1))
        assert abs(ours - ref) < 1e-5

    def test_cross_entropy_vs_torch(self):
        rng = np.random.RandomState(2)
        logits = rng.randn(5, 3).astype(np.float32)
        targets = rng.randint(0, 3, 5)
        ours = float(losses.cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets)))
        ref = float(F.cross_entropy(torch.from_numpy(logits),
                                    torch.from_numpy(targets)))
        assert abs(ours - ref) < 1e-5

    def test_accuracy(self):
        logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        targets = jnp.asarray([1, 2])
        a1, a2 = losses.accuracy(logits, targets, topk=(1, 2))
        assert abs(float(a1) - 50.0) < 1e-5
        assert abs(float(a2) - 50.0) < 1e-5
