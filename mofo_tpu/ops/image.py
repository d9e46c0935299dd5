"""Batched on-device image/video augmentation ops.

The TPU-native replacement for the reference's per-frame PIL/cv2 host
pipeline (transforms.py, video_transforms.py, random_erasing.py): every op
here operates on whole batches of clips (B, T, H, W, C) inside jit, so
augmentation fuses into the input side of the train step instead of
occupying host workers.

Covered reference surfaces:
  - GroupMultiScaleCrop (transforms.py:137-389): scale-pair crop sizes
    {1, .875, .75, .66} with max_distort 1, 13 fixed offsets, bilinear
    resize to size
  - random_resized_crop / _get_param_spatial_crop
    (video_transforms.py:499-538): Inception-style scale/ratio sampling
  - random_short_side_scale_jitter, uniform_crop (3-crop),
    horizontal_flip (video_transforms.py)
  - GroupNormalize / tensor_normalize (kinetics.py:358-375)
  - RandomErasing with cube=True: same erase box for every frame of a
    clip, 'pixel' mode fills with per-pixel gaussian noise
    (random_erasing.py:27-173)

Geometry convention: boxes are (y1, x1, y2, x2) floats in source pixels;
sampling uses half-pixel-center bilinear (cv2/torch resize semantics).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.core import constants

Array = jax.Array


# ---------------------------------------------------------------------------
# Core: batched crop-and-resize via bilinear gather
# ---------------------------------------------------------------------------


def _bilinear_gather(
    imgs: Array, ys: Array, xs: Array
) -> Array:
    """imgs: (B, T, H, W, C); ys/xs: (B, out_h)/(B, out_w) source coords.
    Returns (B, T, out_h, out_w, C). Out-of-range coords clamp to edge."""
    B, T, H, W, C = imgs.shape
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys, 0, H - 1) - y0
    wx = jnp.clip(xs, 0, W - 1) - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    def take_rows(img_rows, idx):
        # img_rows: (B, T, H, W, C), idx: (B, out_h) -> (B, T, out_h, W, C)
        return jax.vmap(
            lambda im, ii: jnp.take(im, ii, axis=1)
        )(img_rows, idx)

    def take_cols(img_cols, idx):
        # (B, T, out_h, W, C), idx: (B, out_w) -> (B, T, out_h, out_w, C)
        return jax.vmap(
            lambda im, ii: jnp.take(im, ii, axis=2)
        )(img_cols, idx)

    top = take_rows(imgs, y0i)
    bot = take_rows(imgs, y1i)
    tl = take_cols(top, x0i)
    tr = take_cols(top, x1i)
    bl = take_cols(bot, x0i)
    br = take_cols(bot, x1i)
    wy_b = wy[:, None, :, None, None]
    wx_b = wx[:, None, None, :, None]
    topmix = tl * (1 - wx_b) + tr * wx_b
    botmix = bl * (1 - wx_b) + br * wx_b
    return topmix * (1 - wy_b) + botmix * wy_b


def crop_and_resize(
    imgs: Array, boxes: Array, out_size: Tuple[int, int]
) -> Array:
    """Crop per-sample boxes (B, 4) = (y1, x1, y2, x2) and resize to
    out_size (h, w), bilinear, half-pixel centers."""
    out_h, out_w = out_size
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    scale_y = (y2 - y1) / out_h
    scale_x = (x2 - x1) / out_w
    oy = jnp.arange(out_h, dtype=jnp.float32)[None, :]
    ox = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    ys = y1[:, None] + (oy + 0.5) * scale_y[:, None] - 0.5
    xs = x1[:, None] + (ox + 0.5) * scale_x[:, None] - 0.5
    return _bilinear_gather(imgs, ys, xs)


def resize(imgs: Array, out_size: Tuple[int, int]) -> Array:
    """Plain bilinear resize of (B, T, H, W, C)."""
    B = imgs.shape[0]
    H, W = imgs.shape[2], imgs.shape[3]
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, float(H), float(W)]), (B, 1)
    )
    return crop_and_resize(imgs, boxes, out_size)


# ---------------------------------------------------------------------------
# Crop parameter samplers (inside jit)
# ---------------------------------------------------------------------------


def random_resized_crop_boxes(
    rng: Array,
    batch: int,
    img_hw: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Array:
    """Inception-style crop boxes (video_transforms.py:499-538): 10
    attempts of (area, log-uniform ratio); first fit wins, else central
    fallback. Returns (B, 4) = (y1, x1, y2, x2)."""
    H, W = img_hw
    n_try = 10
    r_area, r_ratio, r_i, r_j = jax.random.split(rng, 4)
    area = H * W * jax.random.uniform(
        r_area, (batch, n_try), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        r_ratio,
        (batch, n_try),
        minval=np.log(ratio[0]),
        maxval=np.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    ok = (w <= W) & (h <= H)
    # first valid attempt (argmax of ok over tries; all-False -> fallback)
    first = jnp.argmax(ok, axis=1)
    any_ok = jnp.any(ok, axis=1)
    w = jnp.take_along_axis(w, first[:, None], axis=1)[:, 0]
    h = jnp.take_along_axis(h, first[:, None], axis=1)[:, 0]
    # uniform placement
    i = jax.random.uniform(r_i, (batch,)) * (H - h)
    j = jax.random.uniform(r_j, (batch,)) * (W - w)
    # central fallback (torchvision semantics: clamp ratio, center crop)
    in_ratio = W / H
    fb_w = jnp.where(
        in_ratio < ratio[0], float(W),
        jnp.where(in_ratio > ratio[1], H * ratio[1], float(W)),
    )
    fb_h = jnp.where(
        in_ratio < ratio[0], W / ratio[0],
        jnp.where(in_ratio > ratio[1], float(H), float(H)),
    )
    fb_i = (H - fb_h) / 2.0
    fb_j = (W - fb_w) / 2.0
    h = jnp.where(any_ok, h, fb_h)
    w = jnp.where(any_ok, w, fb_w)
    i = jnp.where(any_ok, i, fb_i)
    j = jnp.where(any_ok, j, fb_j)
    return jnp.stack([i, j, i + h, j + w], axis=1)


# GroupMultiScaleCrop constants (transforms.py:137-175)
_MSC_SCALES = (1.0, 0.875, 0.75, 0.66)
_MSC_MAX_DISTORT = 1


def _msc_size_pairs(base: int, out_size: int) -> np.ndarray:
    """Crop size pairs drawn from scales of min(H, W) of the decoded frame
    (transforms.py:143-152): sizes = int(min(H,W) * scale), then any size
    within 3px of the network input size snaps to it exactly."""
    sizes = [int(base * s) for s in _MSC_SCALES]
    sizes = [out_size if abs(s - out_size) < 3 else s for s in sizes]
    pairs = []
    for i, h in enumerate(sizes):
        for j, w in enumerate(sizes):
            if abs(i - j) <= _MSC_MAX_DISTORT:
                pairs.append((h, w))
    return np.asarray(pairs, dtype=np.float32)


def _msc_offsets(H: int, W: int, ch: Array, cw: Array) -> Array:
    """The 13 fixed crop offsets (transforms.py:345-368). ch/cw: (B,).
    Returns (B, 13, 2) = (y, x)."""
    w_step = (W - cw) / 4.0
    h_step = (H - ch) / 4.0
    zeros = jnp.zeros_like(w_step)
    cands = [
        (zeros, zeros),
        (zeros, 4 * w_step),
        (4 * h_step, zeros),
        (4 * h_step, 4 * w_step),
        (2 * h_step, 2 * w_step),
        (zeros, 2 * w_step),
        (4 * h_step, 2 * w_step),
        (2 * h_step, zeros),
        (2 * h_step, 4 * w_step),
        (1 * h_step, 1 * w_step),
        (1 * h_step, 3 * w_step),
        (3 * h_step, 1 * w_step),
        (3 * h_step, 3 * w_step),
    ]
    return jnp.stack(
        [jnp.stack([y, x], axis=-1) for y, x in cands], axis=1
    )


def multi_scale_crop_boxes(
    rng: Array, batch: int, img_hw: Tuple[int, int], base_size: int
) -> Array:
    """GroupMultiScaleCrop crop boxes: random size pair from the
    max-distort-1 scale grid over min(H, W) (snapping near-base_size sizes
    to base_size), random fixed offset. (B, 4) (y1,x1,y2,x2)."""
    H, W = img_hw
    pairs = jnp.asarray(_msc_size_pairs(min(H, W), base_size))
    r_pair, r_off = jax.random.split(rng)
    pair_idx = jax.random.randint(r_pair, (batch,), 0, pairs.shape[0])
    ch = pairs[pair_idx, 0]
    cw = pairs[pair_idx, 1]
    offs = _msc_offsets(H, W, ch, cw)  # (B, 13, 2)
    off_idx = jax.random.randint(r_off, (batch,), 0, offs.shape[1])
    sel = jnp.take_along_axis(
        offs, off_idx[:, None, None], axis=1
    )[:, 0]
    y1, x1 = sel[:, 0], sel[:, 1]
    return jnp.stack([y1, x1, y1 + ch, x1 + cw], axis=1)


def center_crop_boxes(
    batch: int, img_hw: Tuple[int, int], crop: Tuple[int, int]
) -> Array:
    H, W = img_hw
    ch, cw = crop
    y1 = (H - ch) / 2.0
    x1 = (W - cw) / 2.0
    return jnp.tile(
        jnp.asarray([y1, x1, y1 + ch, x1 + cw], jnp.float32), (batch, 1)
    )


def three_crop_boxes(
    img_hw: Tuple[int, int], size: int, split_nb: int, num_crops: int = 3
) -> Tuple[float, float, float, float]:
    """Spatial window for test view split_nb along the long side
    (ssv2.py:138-147): start = split_nb * (long - size) / (crops - 1)."""
    H, W = img_hw
    if H >= W:
        step = (H - size) / max(num_crops - 1, 1)
        y1 = split_nb * step
        return (y1, 0.0, y1 + size, float(W))
    step = (W - size) / max(num_crops - 1, 1)
    x1 = split_nb * step
    return (0.0, x1, float(H), x1 + size)


def short_side_scale_size(
    h: int, w: int, short_side: int
) -> Tuple[int, int]:
    if h <= w:
        return short_side, int(round(w * short_side / h))
    return int(round(h * short_side / w)), short_side


# ---------------------------------------------------------------------------
# Elementwise ops
# ---------------------------------------------------------------------------


def horizontal_flip(rng: Array, imgs: Array, prob: float = 0.5) -> Array:
    """Per-sample random horizontal flip."""
    flip = jax.random.bernoulli(rng, prob, (imgs.shape[0],))
    return jnp.where(
        flip[:, None, None, None, None], jnp.flip(imgs, axis=3), imgs
    )


def normalize(
    imgs: Array,
    mean: Sequence[float] = constants.IMAGENET_DEFAULT_MEAN,
    std: Sequence[float] = constants.IMAGENET_DEFAULT_STD,
) -> Array:
    m = jnp.asarray(mean, imgs.dtype)
    s = jnp.asarray(std, imgs.dtype)
    return (imgs - m) / s


def random_erasing(
    rng: Array,
    imgs: Array,
    prob: float = 0.25,
    area_range: Tuple[float, float] = (0.02, 1.0 / 3.0),
    aspect_range: Tuple[float, float] = (0.3, 10.0 / 3.0),
    mode: str = "pixel",
    cube: bool = True,
) -> Array:
    """RandomErasing (random_erasing.py:27-173). cube=True erases the SAME
    box in every frame of a clip; 'pixel' mode fills with per-pixel
    standard-normal noise (per_pixel=True), 'const' fills zeros.

    Operates on normalized clips (the reference applies it after
    normalization, kinetics.py:216-222). Single erase box per clip
    (count=1, the default)."""
    B, T, H, W, C = imgs.shape
    r_apply, r_area, r_ratio, r_y, r_x, r_fill = jax.random.split(rng, 6)
    apply = jax.random.bernoulli(r_apply, prob, (B,))
    area = H * W * jax.random.uniform(
        r_area, (B,), minval=area_range[0], maxval=area_range[1]
    )
    log_r = jax.random.uniform(
        r_ratio,
        (B,),
        minval=np.log(aspect_range[0]),
        maxval=np.log(aspect_range[1]),
    )
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1, H - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1, W - 1).astype(jnp.int32)
    y1 = (jax.random.uniform(r_y, (B,)) * (H - eh)).astype(jnp.int32)
    x1 = (jax.random.uniform(r_x, (B,)) * (W - ew)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    box = (
        (rows >= y1[:, None, None])
        & (rows < (y1 + eh)[:, None, None])
        & (cols >= x1[:, None, None])
        & (cols < (x1 + ew)[:, None, None])
    )  # (B, H, W)
    box = box & apply[:, None, None]
    if mode == "pixel":
        if cube:
            fill = jax.random.normal(r_fill, (B, 1, H, W, C), imgs.dtype)
        else:
            fill = jax.random.normal(r_fill, (B, T, H, W, C), imgs.dtype)
    else:
        fill = jnp.zeros((B, 1, H, W, C), imgs.dtype)
    if not cube:
        # independent boxes per frame are not in the reference recipe
        # (cube=True default); per-frame fill already varies
        pass
    return jnp.where(box[:, None, :, :, None], fill, imgs)
