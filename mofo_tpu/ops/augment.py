"""Composed on-device augmentation pipelines.

The reference runs augmentation per sample in DataLoader workers
(DataAugmentationForVideoMAE, datasets.py:10-36; _aug_frame,
kinetics.py:163-222). Here the host ships fixed-size decoded uint8 frames
and the whole batch is augmented in one jitted program on device — the
north-star input design.

Pipelines:
  pretrain_augment    — GroupMultiScaleCrop(224) -> normalize
                        (datasets.py:27-33); the BB variant also maps
                        per-frame boxes through the crop (transforms.py:
                        92-135, crop-space clamp, empty box -> [0,0,1,1])
  finetune_augment    — RandAugment -> normalize -> random-resized-crop
                        (0.08-1.0 / 3:4-4:3) -> optional hflip ->
                        RandomErasing (kinetics.py:163-222 order)
  eval_augment        — short-side resize -> center crop -> normalize
  test_view_augment   — short-side resize -> 3-crop window by split_nb
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mofo_tpu.ops import image as I
from mofo_tpu.ops.rand_augment import rand_augment_batch

Array = jax.Array


def _to_float01(clips_u8: Array) -> Array:
    return clips_u8.astype(jnp.float32) / 255.0


def _map_boxes_through_crop(
    boxes: Array, crop: Array, out_size
) -> Array:
    """boxes: (B, T, 4) (x1, y1, x2, y2) source pixels; crop: (B, 4)
    (y1, x1, y2, x2). Clamp to the crop then scale to the output, like the
    albumentations Crop+Resize pascal_voc tracking (transforms.py:102-135).
    Boxes that vanish become [0, 0, 1, 1]. out_size: int or (h, w)."""
    out_h, out_w = (
        (out_size, out_size) if isinstance(out_size, int) else out_size
    )
    cy1, cx1, cy2, cx2 = (
        crop[:, 0:1], crop[:, 1:2], crop[:, 2:3], crop[:, 3:4]
    )
    sx = out_w / (cx2 - cx1)
    sy = out_h / (cy2 - cy1)
    x1 = (jnp.clip(boxes[..., 0], cx1, cx2) - cx1) * sx
    y1 = (jnp.clip(boxes[..., 1], cy1, cy2) - cy1) * sy
    x2 = (jnp.clip(boxes[..., 2], cx1, cx2) - cx1) * sx
    y2 = (jnp.clip(boxes[..., 3], cy1, cy2) - cy1) * sy
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    empty = (out[..., 2] - out[..., 0] < 1.0) | (
        out[..., 3] - out[..., 1] < 1.0
    )
    fallback = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    return jnp.where(empty[..., None], fallback, out)


def pretrain_augment(
    rng: Array,
    clips_u8: Array,
    out_size: int = 224,
    boxes: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """uint8 (B, T, H0, W0, 3) -> normalized float32 (B, T, S, S, 3).
    Returns (clips, boxes') where boxes' are crop-space pixel boxes when
    given."""
    B, T = clips_u8.shape[:2]
    H0, W0 = clips_u8.shape[2], clips_u8.shape[3]
    crop = I.multi_scale_crop_boxes(rng, B, (H0, W0), out_size)
    x = _to_float01(clips_u8)
    x = I.crop_and_resize(x, crop, (out_size, out_size))
    x = I.normalize(x)
    out_boxes = None
    if boxes is not None:
        out_boxes = _map_boxes_through_crop(boxes, crop, out_size)
    return x, out_boxes


def finetune_augment(
    rng: Array,
    clips_u8: Array,
    out_size: int = 224,
    aa: Optional[str] = "rand-m7-n4-mstd0.5-inc1",
    flip: bool = True,
    reprob: float = 0.25,
    boxes: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Training augmentation (kinetics.py:163-222 order): RandAugment on
    [0,255] -> normalize -> inception crop -> flip -> erasing."""
    r_aa, r_crop, r_flip, r_erase = jax.random.split(rng, 4)
    B = clips_u8.shape[0]
    H0, W0 = clips_u8.shape[2], clips_u8.shape[3]
    x = clips_u8.astype(jnp.float32)
    if aa:
        if boxes is not None:
            # BB fork: boxes thread through RandAugment (transformed
            # under rotate, rand_augment_BB_focused.py:108-171) BEFORE
            # the crop mapping
            x, boxes = rand_augment_batch(r_aa, x, aa, boxes=boxes)
        else:
            x = rand_augment_batch(r_aa, x, aa)
    x = I.normalize(x / 255.0)
    crop = I.random_resized_crop_boxes(r_crop, B, (H0, W0))
    x = I.crop_and_resize(x, crop, (out_size, out_size))
    out_boxes = None
    if boxes is not None:
        out_boxes = _map_boxes_through_crop(boxes, crop, out_size)
    if flip:
        # NOTE: flipping does not remap boxes; the reference disables flip
        # for SSV2/EK (kinetics.py:203, epic_kitchens.py:228) which are the
        # BB datasets, so box-aware flip never occurs there either.
        x = I.horizontal_flip(r_flip, x)
    if reprob > 0:
        x = I.random_erasing(r_erase, x, prob=reprob)
    return x, out_boxes


def eval_augment(
    clips_u8: Array,
    out_size: int = 224,
    short_side: int = 224,
    boxes: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Validation: Resize(short side) -> CenterCrop -> normalize
    (kinetics.py val path)."""
    B = clips_u8.shape[0]
    H0, W0 = clips_u8.shape[2], clips_u8.shape[3]
    rh, rw = I.short_side_scale_size(H0, W0, short_side)
    x = _to_float01(clips_u8)
    x = I.resize(x, (rh, rw))
    crop = I.center_crop_boxes(B, (rh, rw), (out_size, out_size))
    x = I.crop_and_resize(x, crop, (out_size, out_size))
    x = I.normalize(x)
    out_boxes = None
    if boxes is not None:
        scale = jnp.asarray([rw / W0, rh / H0, rw / W0, rh / H0])
        out_boxes = _map_boxes_through_crop(
            boxes * scale, crop, out_size
        )
    return x, out_boxes


def test_view_augment(
    clips_u8: Array,
    split_nb: int,
    out_size: int = 224,
    short_side: int = 224,
    num_crops: int = 3,
    boxes: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Test view: short-side resize then the split_nb-th spatial window
    along the long side (ssv2.py:138-147)."""
    B = clips_u8.shape[0]
    H0, W0 = clips_u8.shape[2], clips_u8.shape[3]
    rh, rw = I.short_side_scale_size(H0, W0, short_side)
    x = _to_float01(clips_u8)
    x = I.resize(x, (rh, rw))
    y1, x1, y2, x2 = I.three_crop_boxes((rh, rw), out_size, split_nb,
                                        num_crops)
    crop = jnp.tile(jnp.asarray([y1, x1, y2, x2], jnp.float32), (B, 1))
    # the reference takes the raw window (no resize: size matches), but
    # crop_and_resize with an exact-size box is identity sampling
    out_h = int(round(y2 - y1))
    out_w = int(round(x2 - x1))
    x = I.crop_and_resize(x, crop, (out_h, out_w))
    x = I.normalize(x)
    out_boxes = None
    if boxes is not None:
        scale = jnp.asarray([rw / W0, rh / H0, rw / W0, rh / H0])
        out_boxes = _map_boxes_through_crop(
            boxes * scale, crop, (out_h, out_w)
        )
    return x, out_boxes
