"""Device augmentation ops: crop/resize geometry, erasing invariants, and
RandAugment pointwise-op golden parity against PIL."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from mofo_tpu.ops import image as I
from mofo_tpu.ops import rand_augment as RA


def _clip(B=2, T=2, H=32, W=48, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))


class TestCropResize:
    def test_identity_crop(self):
        clips = _clip()
        boxes = jnp.tile(jnp.asarray([0.0, 0.0, 32.0, 48.0]), (2, 1))
        out = I.crop_and_resize(clips, boxes, (32, 48))
        np.testing.assert_allclose(np.asarray(out), np.asarray(clips),
                                   atol=1e-5)

    def test_matches_cv2_resize(self):
        import cv2

        clips = _clip(B=1, T=1)
        out = np.asarray(I.resize(clips, (16, 24)))[0, 0]
        ref = cv2.resize(
            np.asarray(clips)[0, 0], (24, 16),
            interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_crop_subregion(self):
        clips = _clip()
        boxes = jnp.tile(jnp.asarray([4.0, 8.0, 20.0, 24.0]), (2, 1))
        out = I.crop_and_resize(clips, boxes, (16, 16))
        ref = np.asarray(clips)[:, :, 4:20, 8:24, :]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_random_resized_crop_boxes_in_bounds(self):
        boxes = I.random_resized_crop_boxes(
            jax.random.PRNGKey(0), 64, (224, 224))
        b = np.asarray(boxes)
        assert (b[:, 0] >= -1e-3).all() and (b[:, 2] <= 224 + 1e-3).all()
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        assert (areas >= 0.0799 * 224 * 224).all()

    def test_multi_scale_crop_sizes(self):
        # base = min(H, W) = 256 (transforms.py:143-146): sizes are scales
        # of the decoded short side, with near-224 sizes snapped to 224
        # (int(256*.875)=224 exactly here).
        boxes = I.multi_scale_crop_boxes(
            jax.random.PRNGKey(1), 128, (256, 320), 224)
        b = np.asarray(boxes)
        sizes = {int(round(x)) for x in (b[:, 2] - b[:, 0])}
        allowed = {256, 224, int(256 * 0.75), int(256 * 0.66)}
        assert sizes <= allowed
        assert 256 in sizes  # full short side must be reachable
        assert (b[:, 2] <= 256 + 1e-3).all() and (b[:, 3] <= 320 + 1e-3).all()

    def test_multi_scale_crop_snap(self):
        # a 226-px short side: int(226*1.0)=226 is within 3px of 224 → snaps
        pairs = I._msc_size_pairs(226, 224)
        assert 226 not in set(pairs.flatten().astype(int))
        assert 224 in set(pairs.flatten().astype(int))

    def test_three_crop(self):
        # landscape: crops slide along width
        for s in range(3):
            y1, x1, y2, x2 = I.three_crop_boxes((224, 320), 224, s)
            assert y1 == 0 and y2 == 224
            assert 0 <= x1 <= 320 - 224 + 1e-6
        assert I.three_crop_boxes((224, 320), 224, 2)[1] == 96.0

    def test_short_side_scale(self):
        assert I.short_side_scale_size(240, 320, 224) == (224, 299)
        assert I.short_side_scale_size(320, 240, 224) == (299, 224)


class TestFlipNormalizeErase:
    def test_flip(self):
        clips = _clip()
        out = I.horizontal_flip(jax.random.PRNGKey(0), clips, prob=1.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(clips)[:, :, :, ::-1, :], atol=1e-6)
        out = I.horizontal_flip(jax.random.PRNGKey(0), clips, prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(clips))

    def test_normalize_roundtrip(self):
        clips = _clip()
        from mofo_tpu.ops.patchify import unnormalize_clip

        out = unnormalize_clip(I.normalize(clips))
        np.testing.assert_allclose(np.asarray(out), np.asarray(clips),
                                   atol=1e-5)

    def test_erasing_cube_consistency(self):
        clips = _clip(B=8, T=4)
        out = np.asarray(
            I.random_erasing(jax.random.PRNGKey(3), clips, prob=1.0))
        orig = np.asarray(clips)
        changed = ~np.isclose(out, orig).all(axis=-1)  # (B, T, H, W)
        for b in range(8):
            # same erase box in every frame (cube=True)
            np.testing.assert_array_equal(changed[b, 0], changed[b, 1])
            assert changed[b, 0].any()

    def test_erasing_prob_zero(self):
        clips = _clip()
        out = I.random_erasing(jax.random.PRNGKey(3), clips, prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(clips))


class TestRandAugmentGoldenVsPIL:
    def _img(self, seed=0, H=24, W=32):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
        return arr

    def _ours(self, op, arr, level, neg=1.0):
        out = op(jnp.asarray(arr[None].astype(np.float32)),
                 jnp.asarray(level, jnp.float32), jnp.asarray(neg))
        return np.asarray(out)[0]

    def test_invert(self):
        arr = self._img()
        ours = self._ours(RA._op_invert, arr, 0.0)
        ref = np.asarray(ImageOps.invert(Image.fromarray(arr)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_solarize(self):
        arr = self._img(1)
        # level 5 -> threshold 256 - 128 = 128
        ours = self._ours(RA._op_solarize, arr, 5.0)
        ref = np.asarray(ImageOps.solarize(Image.fromarray(arr), 128))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_solarize_add(self):
        arr = self._img(2)
        # level 5 -> add 55, threshold 128 (rand_augment.py:119-129)
        ours = self._ours(RA._op_solarize_add, arr, 5.0)
        a = arr.astype(np.int64)
        ref = np.where(a < 128, np.minimum(a + 55, 255), a)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_posterize(self):
        arr = self._img(3)
        # level 5 -> bits = 4 - int(0.5*4) = 2
        ours = self._ours(RA._op_posterize, arr, 5.0)
        ref = np.asarray(ImageOps.posterize(Image.fromarray(arr), 2))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_equalize(self):
        arr = self._img(4)
        ours = self._ours(RA._op_equalize, arr, 0.0)
        ref = np.asarray(ImageOps.equalize(Image.fromarray(arr)))
        np.testing.assert_allclose(ours, ref, atol=1.0)

    def test_autocontrast(self):
        arr = self._img(5)
        ours = self._ours(RA._op_autocontrast, arr, 0.0)
        ref = np.asarray(ImageOps.autocontrast(Image.fromarray(arr)))
        np.testing.assert_allclose(ours, ref, atol=1.5)

    def test_brightness(self):
        arr = self._img(6)
        # level 5, neg=+1 -> factor 1.45
        ours = self._ours(RA._op_brightness, arr, 5.0)
        ref = np.asarray(
            ImageEnhance.Brightness(Image.fromarray(arr)).enhance(1.45))
        np.testing.assert_allclose(ours, ref, atol=1.0)

    def test_color(self):
        arr = self._img(7)
        ours = self._ours(RA._op_color, arr, 5.0, neg=-1.0)  # factor 0.55
        ref = np.asarray(
            ImageEnhance.Color(Image.fromarray(arr)).enhance(0.55))
        np.testing.assert_allclose(ours, ref, atol=1.5)

    def test_contrast(self):
        arr = self._img(8)
        ours = self._ours(RA._op_contrast, arr, 5.0)  # factor 1.45
        ref = np.asarray(
            ImageEnhance.Contrast(Image.fromarray(arr)).enhance(1.45))
        np.testing.assert_allclose(ours, ref, atol=1.5)

    def test_sharpness(self):
        arr = self._img(9)
        ours = self._ours(RA._op_sharpness, arr, 5.0)  # factor 1.45
        ref = np.asarray(
            ImageEnhance.Sharpness(Image.fromarray(arr)).enhance(1.45))
        np.testing.assert_allclose(ours, ref, atol=2.0)

    def test_rotate_approx(self):
        arr = self._img(10)
        # level 10, neg=+1 -> 30 degrees
        ours = self._ours(RA._op_rotate, arr, 10.0)
        ref = np.asarray(
            Image.fromarray(arr).rotate(
                30.0, resample=Image.BILINEAR,
                fillcolor=(128, 128, 128)))
        # bilinear rounding differs at edges; compare the bulk
        close = np.isclose(ours, ref, atol=12.0)
        assert close.mean() > 0.93, close.mean()

    def test_translate_exact(self):
        arr = self._img(11)
        # level 10 -> 0.45 * W shift
        ours = self._ours(RA._op_translate_x, arr, 10.0)
        W = arr.shape[1]
        v = int(0.45 * W)
        ref = np.asarray(
            Image.fromarray(arr).transform(
                (arr.shape[1], arr.shape[0]), Image.AFFINE,
                (1, 0, 0.45 * W, 0, 1, 0),
                resample=Image.BILINEAR,
                fillcolor=(128, 128, 128)))
        close = np.isclose(ours, ref, atol=2.0)
        assert close.mean() > 0.95, close.mean()

    def test_full_pipeline_runs_and_changes_pixels(self):
        clips = jnp.asarray(
            (np.random.RandomState(0).rand(2, 2, 24, 32, 3) * 255
             ).astype(np.float32))
        out = RA.rand_augment_batch(
            jax.random.PRNGKey(0), clips, "rand-m7-n4-mstd0.5-inc1")
        assert out.shape == clips.shape
        assert np.isfinite(np.asarray(out)).all()
        assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255

    def test_config_parse(self):
        cfg = RA.parse_rand_augment_config("rand-m7-n4-mstd0.5-inc1")
        assert cfg["magnitude"] == 7 and cfg["num_layers"] == 4
        assert cfg["magnitude_std"] == 0.5 and cfg["increasing"]


class TestBBRandAugmentBoxThreading:
    """Golden parity vs a literal transcription of the reference BB
    fork's rotate-box arithmetic (rand_augment_BB_focused.py:108-171)."""

    @staticmethod
    def _ref_rotate_box(bbox, degrees, w, h):
        import math

        angle = -math.radians(degrees)
        matrix = [
            round(math.cos(angle), 15), round(math.sin(angle), 15), 0.0,
            round(-math.sin(angle), 15), round(math.cos(angle), 15), 0.0,
        ]

        def transform(x, y, m):
            a, b, c, d, e, f = m
            return a * x + b * y + c, d * x + e * y + f

        matrix[2], matrix[5] = transform(-w / 2.0, -h / 2.0, matrix)
        matrix[2] += w / 2.0
        matrix[5] += h / 2.0
        bbox = list(bbox)
        bbox[0], bbox[1] = transform(bbox[0], bbox[1], matrix)
        bbox[2], bbox[3] = transform(bbox[2], bbox[3], matrix)
        return bbox

    def test_rotate_box_matches_reference(self):
        H, W = 224, 320
        boxes = jnp.asarray([[30.0, 40.0, 200.0, 180.0],
                             [0.0, 0.0, 320.0, 224.0]])
        for degrees in (-30.0, -7.5, 12.0, 30.0):
            level = jnp.float32(abs(degrees) / 30.0 * RA.MAX_LEVEL)
            neg = jnp.float32(1.0 if degrees >= 0 else -1.0)
            ours = np.asarray(RA.rotate_box(boxes, level, neg, (H, W)))
            for i in range(boxes.shape[0]):
                ref = self._ref_rotate_box(
                    [float(v) for v in np.asarray(boxes[i])], degrees, W, H
                )
                np.testing.assert_allclose(ours[i], ref, atol=1e-3)

    def test_boxes_change_only_under_rotate(self):
        # force the op choice by scanning seeds: collect cases where the
        # box moved and verify each coincides with a rotate application
        clips = jnp.asarray(
            (np.random.RandomState(0).rand(1, 2, 32, 48, 3) * 255
             ).astype(np.float32))
        boxes = jnp.asarray([[[5.0, 6.0, 40.0, 28.0]]        # (1, 1, 4)
                             * 2]).reshape(1, 2, 4)
        moved = 0
        for seed in range(24):
            out, bx = RA.rand_augment_batch(
                jax.random.PRNGKey(seed), clips,
                "rand-m9-n2-mstd0.5-inc1", boxes=boxes)
            assert out.shape == clips.shape and bx.shape == boxes.shape
            if not np.allclose(np.asarray(bx), np.asarray(boxes)):
                moved += 1
        # rotate is 1 of 15 ops x 2 layers x p=.5 -> expect a few moves
        assert moved >= 1


class TestBicubicGoldenVsPIL:
    """The geometric ops' bicubic mode vs PIL BICUBIC resampling
    (reference picks bilinear/bicubic per call, rand_augment.py:47)."""

    def _img(self, seed=0, H=24, W=32):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, (H, W, 3), dtype=np.uint8)

    def _ours(self, op, arr, level, neg=1.0):
        out = op(jnp.asarray(arr[None].astype(np.float32)),
                 jnp.asarray(level, jnp.float32), jnp.asarray(neg),
                 interp=jnp.asarray(1))
        return np.asarray(out)[0]

    def test_translate_bicubic(self):
        arr = self._img(21)
        ours = self._ours(RA._op_translate_x, arr, 10.0)
        W = arr.shape[1]
        ref = np.asarray(
            Image.fromarray(arr).transform(
                (arr.shape[1], arr.shape[0]), Image.AFFINE,
                (1, 0, 0.45 * W, 0, 1, 0),
                resample=Image.BICUBIC,
                fillcolor=(128, 128, 128)))
        close = np.isclose(ours, ref, atol=2.0)
        # interior columns are exact; the 3 columns whose 4x4 footprint
        # crosses the image edge follow PIL's footprint-clamp fast path
        # instead of per-tap fill (91.3% close at this geometry)
        assert close.mean() > 0.90, close.mean()

    def test_rotate_bicubic(self):
        arr = self._img(22)
        ours = self._ours(RA._op_rotate, arr, 10.0)
        ref = np.asarray(
            Image.fromarray(arr).rotate(
                30.0, resample=Image.BICUBIC,
                fillcolor=(128, 128, 128)))
        close = np.isclose(ours, ref, atol=12.0)
        assert close.mean() > 0.90, close.mean()

    def test_shear_bicubic_vs_bilinear_differ(self):
        arr = self._img(23)
        img = jnp.asarray(arr[None].astype(np.float32))
        bi = RA._op_shear_x(img, 8.0, 1.0, interp=jnp.asarray(0))
        bc = RA._op_shear_x(img, 8.0, 1.0, interp=jnp.asarray(1))
        assert not np.allclose(np.asarray(bi), np.asarray(bc))
