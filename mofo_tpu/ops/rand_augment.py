"""RandAugment as batched on-device XLA ops.

TPU-native replacement for the reference's PIL pipeline
(rand_augment.py, timm-derived; driven by config strings like
'rand-m7-n4-mstd0.5-inc1' — parsing mirrors rand_augment.py:481-531).
Semantics preserved:
  - num_layers ops chosen uniformly WITH replacement per clip; each
    applies with prob 0.5 (AugmentOp.prob, rand_augment.py:457)
  - magnitude ~ N(m, mstd) clipped to [0, 10] per op application;
    signed args randomly negated (_randomly_negate)
  - the same sampled args apply to EVERY frame of a clip (AugmentOp maps
    one arg set over the frame list, rand_augment_BB_focused.py:78-81)
  - level maps: rotate +/-30deg, shear +/-0.3, translate +/-0.45 rel,
    enhance 'increasing' 1 +/- 0.9*m/10, posterize-increasing 4-m*4/10
    bits, solarize-increasing 256-m*256/10 threshold, solarize-add
    m*110/10 (rand_augment.py:200-280)
  - geometric fill color 128 (_FILL), PIL inverse-affine convention

Approximations vs PIL (documented, covered by tolerance tests):
  - equalize/autocontrast use exact histogram math but on float inputs
    rounded to uint8 bins
  - geometric ops follow the reference's per-call random bilinear/bicubic
    choice and bicubic uses PIL transform's a=-1 kernel, but the bicubic
    EDGE handling differs: each tap is clamped to the image with
    fill-128 outside, while PIL clamps the whole 4x4 footprint — border
    pixels (~9% of a 224^2 warp) can diverge; golden tests require 90%
    of pixels close rather than exact parity

Input convention: clips (B, T, H, W, C) float32 in [0, 255].
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MAX_LEVEL = 10.0
FILL = 128.0

# op order defines the lax.switch index space; this is the
# _RAND_INCREASING_TRANSFORMS list (rand_augment.py:404-420)
TRANSFORMS = (
    "AutoContrast",
    "Equalize",
    "Invert",
    "Rotate",
    "PosterizeIncreasing",
    "SolarizeIncreasing",
    "SolarizeAdd",
    "ColorIncreasing",
    "ContrastIncreasing",
    "BrightnessIncreasing",
    "SharpnessIncreasing",
    "ShearX",
    "ShearY",
    "TranslateXRel",
    "TranslateYRel",
)


# ---------------------------------------------------------------------------
# Pixel ops. img: (T, H, W, C) float32 [0, 255]; level: scalar in [0, 10];
# neg: +/-1 sign for signed args.
# ---------------------------------------------------------------------------


def _grayscale(img: Array) -> Array:
    """PIL L-mode conversion: R*299/1000 + G*587/1000 + B*114/1000."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _blend(img1: Array, img2: Array, factor: Array) -> Array:
    """PIL Image.blend semantics (ImageEnhance): img1 + factor*(img2-img1),
    clipped to [0, 255]."""
    return jnp.clip(img1 + factor * (img2 - img1), 0.0, 255.0)


def _op_autocontrast(img, level, neg, interp=0):
    del level, neg
    # per frame, per channel min/max stretch (PIL cutoff=0)
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


def _op_equalize(img, level, neg, interp=0):
    del level, neg
    # PIL equalize per frame per channel via histogram LUT:
    # step = (npixels - hist[-1]) // 255; lut[i] = (cumsum_before(i) +
    # step // 2) // step. Histogram as an equality reduction — both
    # one-hot (gigabytes) and scatter-add (pathological TPU compile time)
    # are traps here.
    T, H, W, C = img.shape
    q = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)  # (T,H,W,C)
    qf = q.transpose(0, 3, 1, 2).reshape(T, C, H * W)  # (T, C, HW)
    bins = jnp.arange(256, dtype=jnp.int32)
    # chunk the pixel axis so the (chunk, 256) bool tensor stays small
    chunk = 4096
    n_chunks = -(-H * W // chunk)
    pad = n_chunks * chunk - H * W
    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    qp = qp.reshape(T, C, n_chunks, chunk)

    def chunk_hist(carry, x):
        return carry + jnp.sum(
            (x[..., None] == bins).astype(jnp.float32), axis=-2
        ), None

    hist, _ = jax.lax.scan(
        chunk_hist,
        jnp.zeros((T, C, 256), jnp.float32),
        jnp.moveaxis(qp, 2, 0),  # (n_chunks, T, C, chunk)
    )
    n = float(H * W)
    step = jnp.floor((n - hist[..., 255]) / 255.0)  # (T, C)
    cum_before = jnp.cumsum(hist, axis=-1) - hist  # exclusive cumsum
    lut = jnp.floor(
        (cum_before + jnp.floor(step / 2.0)[..., None])
        / jnp.maximum(step, 1.0)[..., None]
    )
    lut = jnp.clip(lut, 0, 255)  # (T, C, 256)
    out = jnp.take_along_axis(lut, qf, axis=-1)
    out = out.reshape(T, C, H, W).transpose(0, 2, 3, 1)
    return jnp.where(step[:, None, None, :] > 0, out, img)


def _op_invert(img, level, neg, interp=0):
    del level, neg
    return 255.0 - img


def _cubic_weights(t: Array):
    """PIL TRANSFORM bicubic weights for the 4 taps at floor-relative
    offsets (-1, 0, 1, 2); t in [0, 1) is the fractional coordinate.
    geometry.c's affine bicubic uses the classic a = -1 kernel
    (empirically verified against PIL; Resample.c's resize filter uses
    a = -0.5, a different kernel)."""
    a = -1.0

    def k01(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k12(x):  # 1 < |x| < 2
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a

    return k12(1.0 + t), k01(t), k01(1.0 - t), k12(2.0 - t)


def _affine_warp(img: Array, matrix: Tuple,
                 interp: Optional[Array] = None) -> Array:
    """PIL inverse-affine: out(x, y) = src(a*x + b*y + c, d*x + e*y + f),
    fill 128 outside. interp: None/0 -> bilinear; 1 -> PIL bicubic
    (classic a = -1 kernel, 4x4 taps, clamped like PIL's uint8 store). A traced
    interp computes both and selects — the reference picks
    bilinear/bicubic per call at random (rand_augment.py:47,56-60)."""
    a, b, c, d, e, f = matrix
    T, H, W, C = img.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = a * xs + b * ys + c
    src_y = d * xs + e * ys + f
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def sample(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = img[:, yc, xc, :]  # (T, H, W, C)
        return jnp.where(inside[None, :, :, None], vals, FILL)

    tl = sample(y0, x0)
    tr = sample(y0, x0 + 1)
    bl = sample(y0 + 1, x0)
    br = sample(y0 + 1, x0 + 1)
    wxe = wx[None, :, :, None]
    wye = wy[None, :, :, None]
    top = tl * (1 - wxe) + tr * wxe
    bot = bl * (1 - wxe) + br * wxe
    bilinear = top * (1 - wye) + bot * wye
    # A STATIC interp skips the unused branch entirely (direct callers
    # pass a concrete int; only the traced per-call random choice pays
    # for both paths).
    static = (
        int(interp) if isinstance(interp, (int, np.integer)) else None
    )
    if interp is None or static == 0:
        return bilinear

    wxc = [w[None, :, :, None] for w in _cubic_weights(wx)]
    wyc = _cubic_weights(wy)
    acc = jnp.zeros_like(bilinear)
    for dy, wyk in zip((-1.0, 0.0, 1.0, 2.0), wyc):
        row = jnp.zeros_like(bilinear)
        for dx, wxk in zip((-1.0, 0.0, 1.0, 2.0), wxc):
            row = row + sample(y0 + dy, x0 + dx) * wxk
        acc = acc + row * wyk[None, :, :, None]
    bicubic = jnp.clip(acc, 0.0, 255.0)  # PIL clamps on uint8 store
    if static == 1:
        return bicubic
    return jnp.where(jnp.asarray(interp) == 1, bicubic, bilinear)


def _op_rotate(img, level, neg, interp=0):
    # range [-30, 30] degrees; PIL rotate is counterclockwise about center
    deg = (level / MAX_LEVEL) * 30.0 * neg
    rad = deg * jnp.pi / 180.0  # inverse warp of a CCW rotation
    T, H, W, C = img.shape
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # inverse map: src = R^{-1} (dst - center) + center
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_warp(img, (a, b, c, d, e, f), interp)


def _op_posterize(img, level, neg, interp=0):
    del neg
    bits = 4 - jnp.floor(level / MAX_LEVEL * 4.0)
    shift = jnp.clip(8.0 - bits, 0, 8)
    q = jnp.exp2(shift)
    out = jnp.floor(jnp.clip(jnp.round(img), 0, 255) / q) * q
    return out


def _op_solarize(img, level, neg, interp=0):
    del neg
    thresh = 256.0 - jnp.floor(level / MAX_LEVEL * 256.0)
    return jnp.where(img < thresh, img, 255.0 - img)


def _op_solarize_add(img, level, neg, interp=0):
    del neg
    add = jnp.floor(level / MAX_LEVEL * 110.0)
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _enhance_factor(level, neg):
    # 'increasing': 1 +/- 0.9 * m / 10 (rand_augment.py:212-217)
    return 1.0 + neg * (level / MAX_LEVEL) * 0.9


def _op_color(img, level, neg, interp=0):
    gray = jnp.broadcast_to(_grayscale(img), img.shape)
    return _blend(gray, img, _enhance_factor(level, neg))


def _op_contrast(img, level, neg, interp=0):
    # PIL: mean of the L image, rounded; per frame
    gray = _grayscale(img)
    mean = jnp.floor(
        jnp.mean(jnp.floor(gray), axis=(1, 2, 3), keepdims=True) + 0.5
    )
    return _blend(
        jnp.broadcast_to(mean, img.shape), img, _enhance_factor(level, neg)
    )


def _op_brightness(img, level, neg, interp=0):
    return _blend(jnp.zeros_like(img), img, _enhance_factor(level, neg))


def _op_sharpness(img, level, neg, interp=0):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13 on the interior only
    k = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]
    ) / 13.0
    T, H, W, C = img.shape
    x = jnp.moveaxis(img, -1, 1).reshape(T * C, 1, H, W)
    sm = jax.lax.conv_general_dilated(
        x, k[None, None], (1, 1), "SAME"
    ).reshape(T, C, H, W)
    sm = jnp.moveaxis(sm, 1, -1)
    # keep the border unchanged (PIL filter semantics)
    interior = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    sm = jnp.where(interior[None, :, :, None], sm, img)
    return _blend(sm, img, _enhance_factor(level, neg))


def _op_shear_x(img, level, neg, interp=0):
    v = (level / MAX_LEVEL) * 0.3 * neg
    return _affine_warp(img, (1.0, v, 0.0, 0.0, 1.0, 0.0), interp)


def _op_shear_y(img, level, neg, interp=0):
    v = (level / MAX_LEVEL) * 0.3 * neg
    return _affine_warp(img, (1.0, 0.0, 0.0, v, 1.0, 0.0), interp)


def _op_translate_x(img, level, neg, interp=0):
    W = img.shape[2]
    v = (level / MAX_LEVEL) * 0.45 * neg * W
    return _affine_warp(img, (1.0, 0.0, v, 0.0, 1.0, 0.0), interp)


def _op_translate_y(img, level, neg, interp=0):
    H = img.shape[1]
    v = (level / MAX_LEVEL) * 0.45 * neg * H
    return _affine_warp(img, (1.0, 0.0, 0.0, 0.0, 1.0, v), interp)


_OPS = (
    _op_autocontrast,
    _op_equalize,
    _op_invert,
    _op_rotate,
    _op_posterize,
    _op_solarize,
    _op_solarize_add,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_shear_x,
    _op_shear_y,
    _op_translate_x,
    _op_translate_y,
)


# ---------------------------------------------------------------------------
# Config parsing ('rand-m7-n4-mstd0.5-inc1', rand_augment.py:481-531)
# ---------------------------------------------------------------------------


def parse_rand_augment_config(config_str: str) -> Dict:
    cfg = dict(magnitude=10.0, num_layers=2, magnitude_std=0.0,
               increasing=False, prob=0.5)
    parts = config_str.split("-")
    assert parts[0] == "rand", config_str
    for p in parts[1:]:
        m = re.match(r"([a-z]+)([\d.]+)", p)
        if not m:
            continue
        key, val = m.group(1), m.group(2)
        if key == "m":
            cfg["magnitude"] = float(val)
        elif key == "n":
            cfg["num_layers"] = int(val)
        elif key == "mstd":
            cfg["magnitude_std"] = float(val)
        elif key == "inc":
            cfg["increasing"] = bool(int(val))
        elif key == "p":
            cfg["prob"] = float(val)
    return cfg


_ROTATE_IDX = TRANSFORMS.index("Rotate")


def rotate_box(boxes: Array, level: Array, neg: Array,
               size: Tuple[int, int]) -> Array:
    """The BB fork's box transform under rotate: apply the image's
    output->input affine matrix verbatim to the two corner points
    (rand_augment_BB_focused.py:108-171). Only rotate transforms the box;
    shear/translate pass it through unchanged (reference approximation).
    boxes: (..., 4) (x1, y1, x2, y2) pixel coords; size: (H, W)."""
    H, W = size
    deg = (level / MAX_LEVEL) * 30.0 * neg
    angle = -deg * jnp.pi / 180.0  # ref: angle = -radians(degrees)
    cx, cy = W / 2.0, H / 2.0  # ref rotn_center = (w/2, h/2)
    a, b = jnp.cos(angle), jnp.sin(angle)
    d, e = -jnp.sin(angle), jnp.cos(angle)
    c = cx - (a * cx + b * cy)
    f = cy - (d * cx + e * cy)
    x1 = a * boxes[..., 0] + b * boxes[..., 1] + c
    y1 = d * boxes[..., 0] + e * boxes[..., 1] + f
    x2 = a * boxes[..., 2] + b * boxes[..., 3] + c
    y2 = d * boxes[..., 2] + e * boxes[..., 3] + f
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def rand_augment_clip(
    rng: Array,
    clip: Array,
    boxes: Optional[Array] = None,
    *,
    magnitude: float = 7.0,
    num_layers: int = 4,
    magnitude_std: float = 0.5,
    prob: float = 0.5,
):
    """Apply RandAugment to ONE clip (T, H, W, C) float [0, 255].

    With `boxes` (T, 4) given, threads them through the ops the way the
    BB fork does (transform under Rotate only). Returns clip, or
    (clip, boxes) when boxes were given."""
    out = clip
    H, W = clip.shape[1], clip.shape[2]
    for layer in range(num_layers):
        rng, r_op, r_apply, r_mag, r_neg, r_interp = jax.random.split(
            rng, 6
        )
        op_idx = jax.random.randint(r_op, (), 0, len(_OPS))
        apply = jax.random.bernoulli(r_apply, prob)
        mag = magnitude + magnitude_std * jax.random.normal(r_mag)
        mag = jnp.clip(mag, 0.0, MAX_LEVEL)
        neg = jnp.where(jax.random.bernoulli(r_neg, 0.5), -1.0, 1.0)
        # per-call bilinear/bicubic choice for the geometric ops,
        # matching the reference's random.choice(_RANDOM_INTERPOLATION)
        # (rand_augment.py:47,56-60); non-geometric ops ignore it
        interp = jax.random.randint(r_interp, (), 0, 2)
        augmented = jax.lax.switch(
            op_idx, list(_OPS), out, mag, neg, interp
        )
        out = jnp.where(apply, augmented, out)
        if boxes is not None:
            rotated = rotate_box(boxes, mag, neg, (H, W))
            boxes = jnp.where(
                apply & (op_idx == _ROTATE_IDX), rotated, boxes
            )
    if boxes is not None:
        return out, boxes
    return out


def rand_augment_batch(
    rng: Array,
    clips: Array,
    config_str: str = "rand-m7-n4-mstd0.5-inc1",
    boxes: Optional[Array] = None,
):
    """Batched RandAugment: clips (B, T, H, W, C) float [0, 255];
    optional boxes (B, T, 4) threaded per the BB fork."""
    cfg = parse_rand_augment_config(config_str)
    B = clips.shape[0]
    rngs = jax.random.split(rng, B)
    kwargs = dict(
        magnitude=cfg["magnitude"],
        num_layers=cfg["num_layers"],
        magnitude_std=cfg["magnitude_std"],
        prob=cfg["prob"],
    )
    if boxes is not None:
        return jax.vmap(
            lambda r, c, bx: rand_augment_clip(r, c, bx, **kwargs)
        )(rngs, clips, boxes)
    return jax.vmap(
        lambda r, c: rand_augment_clip(r, c, **kwargs)
    )(rngs, clips)
