"""Masking invariants + parity between device and numpy generators.

Reference invariants (masking_generator.py): exactly int(ratio*196) masked
patches per temporal row, identical spatial mask at every timestep (tube),
uniform randomness; the BB variant forces min(num_masks, int(n_inside*
ratio_bb)) in-box masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.ops import masking


class TestTubeMask:
    def test_count_and_tube_property(self):
        rng = jax.random.PRNGKey(0)
        mask = masking.tube_mask(rng, 4)
        assert mask.shape == (4, 1568)
        m = np.asarray(mask).reshape(4, 8, 196)
        # exactly 176 masked per row
        assert (m.sum(-1) == 176).all()
        # same spatial pattern at every timestep
        assert (m == m[:, :1, :]).all()

    def test_rows_differ_across_batch(self):
        rng = jax.random.PRNGKey(0)
        mask = np.asarray(masking.tube_mask(rng, 8)).reshape(8, 8, 196)
        assert not (mask[0, 0] == mask[1, 0]).all()

    def test_uniformity(self):
        # every patch index should be masked ~90% of the time
        rng = jax.random.PRNGKey(42)
        mask = np.asarray(masking.tube_mask(rng, 512)).reshape(512, 8, 196)
        freq = mask[:, 0, :].mean(axis=0)
        assert abs(freq.mean() - 176 / 196) < 1e-6
        assert freq.min() > 0.8 and freq.max() < 0.98

    def test_numpy_generator_matches_reference_semantics(self):
        gen = masking.TubeMaskingGeneratorNumpy((8, 14, 14), 0.9)
        np.random.seed(0)
        m = gen().reshape(8, 196)
        assert m.sum() == 8 * 176
        assert (m == m[0]).all()


class TestBoxToPatchMap:
    def test_exact_rectangle(self):
        # box covering patches (rows 1..2, cols 0..1) exclusive of borders
        boxes = jnp.array([[17.0, 17.0, 31.0, 31.0]])  # x1,y1,x2,y2
        m = np.asarray(
            masking.box_to_patch_map(boxes, patches_per_side=4, patch_size=16)
        ).reshape(4, 4)
        expected = np.zeros((4, 4), bool)
        expected[1:2, 1:2] = True  # rows 17..31 -> patch row 1; cols same
        assert (m == expected).all()

    def test_boundary_touch_counts(self):
        # reference comparisons are inclusive: a box ending exactly at a
        # patch border still marks the adjacent patch
        boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
        m = np.asarray(
            masking.box_to_patch_map(boxes, patches_per_side=4, patch_size=16)
        ).reshape(4, 4)
        assert m[0, 0] and m[0, 1] and m[1, 0] and m[1, 1]
        assert not m[2:, :].any() and not m[:, 2:].any()

    def test_empty_box(self):
        boxes = jnp.array([[0.0, 0.0, 0.0, 0.0]])
        m = masking.box_to_patch_map(boxes, patches_per_side=4, patch_size=16)
        assert not bool(m.any())

    def test_bug_compat_cross_shape(self):
        # reference quirk q2: axis-swapped test yields a row-band/col-band
        # union (cross)
        boxes = jnp.array([[20.0, 20.0, 25.0, 25.0]])
        m = np.asarray(
            masking.box_to_patch_map(
                boxes, patches_per_side=4, patch_size=16, bug_compat=True
            )
        ).reshape(4, 4)
        # row 1 (covers rows 16..32 ~ x range) and col 1 fully marked
        assert m[1, :].all() and m[:, 1].all()
        # corner far away not marked
        assert not m[3, 3]


class TestMotionTubeMask:
    def _boxes(self, B):
        # box covering a 4x4 patch region in a 14x14 grid
        box = jnp.array([32.0, 32.0, 96.0, 96.0])
        return jnp.tile(box, (B, 16, 1))

    def test_mask_budget_exact(self):
        rng = jax.random.PRNGKey(0)
        mask = masking.motion_tube_mask(rng, self._boxes(4))
        m = np.asarray(mask).reshape(4, 8, 196)
        assert (m.sum(-1) == 176).all()
        assert (m == m[:, :1, :]).all()

    def test_in_box_bias(self):
        # all 25 in-box patches (rows/cols 2..6 inclusive) -> cap =
        # int(25*0.75) = 18 forced masked
        rng = jax.random.PRNGKey(1)
        boxes = self._boxes(64)
        mask = np.asarray(masking.motion_tube_mask(rng, boxes)).reshape(
            64, 8, 196
        )
        inside = np.asarray(
            masking.box_to_patch_map(
                boxes[:, 0], patches_per_side=14, patch_size=16
            )
        )
        n_inside = inside[0].sum()
        cap = min(176, int(n_inside * 0.75))
        in_masked = (mask[:, 0, :] & inside).sum(-1)
        assert (in_masked >= cap).all()

    def test_huge_box_caps_at_budget(self):
        rng = jax.random.PRNGKey(2)
        boxes = jnp.tile(jnp.array([0.0, 0.0, 224.0, 224.0]), (2, 16, 1))
        mask = np.asarray(masking.motion_tube_mask(rng, boxes)).reshape(
            2, 8, 196
        )
        assert (mask.sum(-1) == 176).all()

    def test_empty_box_falls_back_to_random(self):
        rng = jax.random.PRNGKey(3)
        boxes = jnp.zeros((2, 16, 4))
        mask = np.asarray(masking.motion_tube_mask(rng, boxes)).reshape(
            2, 8, 196
        )
        assert (mask.sum(-1) == 176).all()

    def test_bug_compat_budget(self):
        rng = jax.random.PRNGKey(4)
        mask = np.asarray(
            masking.motion_tube_mask(rng, self._boxes(4), bug_compat=True)
        ).reshape(4, 8, 196)
        assert (mask.sum(-1) == 176).all()

    def test_numpy_vs_device_same_invariants(self):
        gen = masking.MotionTubeMaskingGeneratorNumpy(
            (8, 14, 14), 0.9, 0.75, bug_compat=True
        )
        np.random.seed(7)
        boxes = np.tile(np.array([32.0, 32.0, 96.0, 96.0]), (16, 1))
        m = gen(boxes).reshape(8, 196)
        assert m.sum() == 8 * 176
        assert (m == m[0]).all()

    def test_union_reduce(self):
        rng = jax.random.PRNGKey(5)
        boxes = jnp.zeros((1, 16, 4)).at[:, 5].set(
            jnp.array([32.0, 32.0, 96.0, 96.0])
        )
        m_first = masking.motion_tube_mask(rng, boxes, box_reduce="first")
        m_union = masking.motion_tube_mask(rng, boxes, box_reduce="union")
        assert m_first.shape == m_union.shape == (1, 1568)


class TestMaskToIndices:
    def test_ascending_split(self):
        mask = jnp.array([[True, False, True, False, True, False]])
        vis, msk = masking.mask_to_indices(mask, 3)
        assert vis.tolist() == [[1, 3, 5]]
        assert msk.tolist() == [[0, 2, 4]]

    def test_matches_boolean_indexing(self):
        rng = jax.random.PRNGKey(0)
        mask = masking.tube_mask(rng, 3)
        vis, msk = masking.mask_to_indices(mask, 8 * 176)
        m = np.asarray(mask)
        for b in range(3):
            np.testing.assert_array_equal(
                np.asarray(vis[b]), np.nonzero(~m[b])[0]
            )
            np.testing.assert_array_equal(
                np.asarray(msk[b]), np.nonzero(m[b])[0]
            )


class TestTokensInBox:
    def test_matches_gathered_map(self):
        """tokens_in_box(boxes, idx) must be bit-identical to gathering
        token_in_box_map(boxes) at idx (it replaces that gather in the
        pretrain step's motion-weighted loss)."""
        from mofo_tpu.models.bb_focused import token_in_box_map

        key = jax.random.PRNGKey(7)
        B, T = 4, 16
        k1, k2, k3 = jax.random.split(key, 3)
        xy1 = jax.random.uniform(k1, (B, T, 2), minval=-8.0, maxval=200.0)
        wh = jax.random.uniform(k2, (B, T, 2), minval=0.0, maxval=160.0)
        boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
        # a few degenerate (empty) boxes too
        boxes = boxes.at[0, 3].set(jnp.array([50.0, 50.0, 50.0, 50.0]))
        idx = jax.random.randint(k3, (B, 37), 0, 1568)
        ref = jnp.take_along_axis(
            token_in_box_map(boxes), idx, axis=1
        )
        got = masking.tokens_in_box(boxes, idx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_boundary_patches(self):
        """Half-open 'paint' edges: a box ending exactly on a patch
        boundary must not touch the next patch."""
        boxes = jnp.tile(
            jnp.array([16.0, 32.0, 32.0, 48.0]), (1, 16, 1)
        )  # covers patch col 1, row 2 exactly
        idx = jnp.array([[2 * 14 + 1, 2 * 14 + 2, 1 * 14 + 1, 2 * 14 + 0]])
        got = masking.tokens_in_box(boxes, idx)
        assert got.tolist() == [[True, False, False, False]]


class TestGatherTokensVJP:
    def test_custom_bwd_matches_autodiff_gather(self):
        """The one-hot-matmul backward of _gather_rows_onehot_bwd must
        equal the scatter-add backward of plain take_along_axis (exact:
        per-row indices are unique, so each output row receives at most
        one contribution)."""
        rng = np.random.RandomState(1)
        tokens = jnp.asarray(rng.randn(3, 20, 8).astype(np.float32))
        idx = jnp.asarray(
            np.stack([rng.choice(20, 7, replace=False) for _ in range(3)])
        ).astype(jnp.int32)
        dy = jnp.asarray(rng.randn(3, 7, 8).astype(np.float32))

        def f_custom(t):
            return jnp.sum(masking._gather_rows_onehot_bwd(t, idx) * dy)

        def f_plain(t):
            return jnp.sum(
                jnp.take_along_axis(t, idx[..., None], axis=1) * dy
            )

        g1 = jax.grad(f_custom)(tokens)
        g2 = jax.grad(f_plain)(tokens)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)
