"""Mixup / CutMix, fully on-device (jit-compatible).

Reference: /root/reference/mixup.py (timm-derived). Semantics preserved:
  - partner sample is the batch flipped along dim 0
  - lam ~ Beta(alpha, alpha); with both mixup and cutmix active, a
    switch_prob coin picks cutmix; a mix_prob coin can disable mixing
    (lam = 1)
  - cutmix box: square of ratio sqrt(1-lam) centered at a uniform point,
    clipped to the image; lam is corrected to 1 - box_area/img_area
    (correct_lam=True default); optional cutmix_minmax box sampling
  - modes: 'batch' (one lam for all), 'elem' (per sample), 'pair'
    (sample i and its partner share params) — mixup.py:159-216
  - targets: one-hot with label smoothing, y1*lam + y2*(1-lam)
    (mixup_target, mixup.py:22-28)

TPU-native differences: dynamic cutmix rectangles are coordinate masks
(iota comparisons), not slice assignments, so everything stays one fused
XLA program with static shapes. Clips are (B, T, H, W, C) channel-last.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def one_hot_smooth(
    targets: Array, num_classes: int, smoothing: float = 0.0
) -> Array:
    """One-hot with label smoothing (mixup.py:17-25)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(targets, num_classes) * (on - off) + off


def _rand_bbox(
    rng: Array, h: int, w: int, lam: Array, count: int
) -> Tuple[Array, Array, Array, Array]:
    """Square cutmix boxes (mixup.py:30-52). lam: (count,). Returns
    (yl, yh, xl, xh) int arrays of shape (count,)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (count,), 0, h)
    cx = jax.random.randint(rx, (count,), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


def _rand_bbox_minmax(
    rng: Array, h: int, w: int, minmax: Tuple[float, float], count: int
) -> Tuple[Array, Array, Array, Array]:
    """Darknet-style min/max boxes (mixup.py:55-76)."""
    rh, rw, ry, rx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(
        rh, (count,), int(h * minmax[0]), int(h * minmax[1])
    )
    cut_w = jax.random.randint(
        rw, (count,), int(w * minmax[0]), int(w * minmax[1])
    )
    yl = jax.random.randint(ry, (count,), 0, h - cut_h, dtype=jnp.int32)
    xl = jax.random.randint(rx, (count,), 0, w - cut_w, dtype=jnp.int32)
    return yl, yl + cut_h, xl, xl + cut_w


def _box_mask(
    yl: Array, yh: Array, xl: Array, xh: Array, h: int, w: int
) -> Array:
    """(count,) box coords -> (count, h, w) boolean inside-box masks."""
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    return (
        (rows >= yl[:, None, None])
        & (rows < yh[:, None, None])
        & (cols >= xl[:, None, None])
        & (cols < xh[:, None, None])
    )


@dataclasses.dataclass(frozen=True)
class Mixup:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    cutmix_minmax: Optional[Tuple[float, float]] = None
    prob: float = 1.0
    switch_prob: float = 0.5
    mode: str = "batch"  # batch | pair | elem
    correct_lam: bool = True
    label_smoothing: float = 0.1
    num_classes: int = 1000

    @property
    def enabled(self) -> bool:
        return (
            self.mixup_alpha > 0
            or self.cutmix_alpha > 0
            or self.cutmix_minmax is not None
        )

    def _sample_params(
        self, rng: Array, count: int
    ) -> Tuple[Array, Array]:
        """lam (count,), use_cutmix (count,) bool — mixup.py:120-156."""
        r_switch, r_lam_mix, r_lam_cut, r_prob = jax.random.split(rng, 4)
        cutmix_alpha = (
            1.0 if self.cutmix_minmax is not None else self.cutmix_alpha
        )
        if self.mixup_alpha > 0 and cutmix_alpha > 0:
            use_cutmix = (
                jax.random.uniform(r_switch, (count,)) < self.switch_prob
            )
            lam_mix = jnp.where(
                use_cutmix,
                jax.random.beta(r_lam_cut, cutmix_alpha, cutmix_alpha,
                                (count,)),
                jax.random.beta(r_lam_mix, self.mixup_alpha,
                                self.mixup_alpha, (count,)),
            )
        elif self.mixup_alpha > 0:
            use_cutmix = jnp.zeros((count,), bool)
            lam_mix = jax.random.beta(
                r_lam_mix, self.mixup_alpha, self.mixup_alpha, (count,)
            )
        elif cutmix_alpha > 0:
            use_cutmix = jnp.ones((count,), bool)
            lam_mix = jax.random.beta(
                r_lam_cut, cutmix_alpha, cutmix_alpha, (count,)
            )
        else:
            raise ValueError("mixup or cutmix must be active")
        apply = jax.random.uniform(r_prob, (count,)) < self.prob
        lam = jnp.where(apply, lam_mix, 1.0)
        return lam.astype(jnp.float32), use_cutmix

    def __call__(
        self, rng: Array, clips: Array, targets: Array
    ) -> Tuple[Array, Array]:
        """clips: (B, T, H, W, C); targets: (B,) int labels.
        Returns (mixed_clips, soft_targets (B, num_classes))."""
        B, T, H, W, C = clips.shape
        if not self.enabled:
            return clips, one_hot_smooth(
                targets, self.num_classes, self.label_smoothing
            )

        r_params, r_box = jax.random.split(rng)
        if self.mode == "batch":
            count = 1
        elif self.mode == "pair":
            count = B // 2
        else:
            count = B
        lam, use_cutmix = self._sample_params(r_params, count)

        if self.cutmix_minmax is not None:
            yl, yh, xl, xh = _rand_bbox_minmax(
                r_box, H, W, self.cutmix_minmax, count
            )
        else:
            yl, yh, xl, xh = _rand_bbox(r_box, H, W, lam, count)
        # A mix_prob miss forces lam = 1 BEFORE any cutmix correction:
        # neither the box nor the corrected lam may apply (mixup.py:143,162).
        no_mix = lam == 1.0
        if self.correct_lam or self.cutmix_minmax is not None:
            area = ((yh - yl) * (xh - xl)).astype(jnp.float32)
            lam_cut = 1.0 - area / float(H * W)
        else:
            lam_cut = lam
        lam = jnp.where(use_cutmix & ~no_mix, lam_cut, lam)
        box = _box_mask(yl, yh, xl, xh, H, W) & use_cutmix[:, None, None]
        box = box & ~no_mix[:, None, None]

        if self.mode == "pair":
            # sample i pairs with B-1-i; both get the same params
            lam = jnp.concatenate([lam, lam[::-1]])
            box = jnp.concatenate([box, box[::-1]], axis=0)
        elif self.mode == "batch":
            lam = jnp.broadcast_to(lam, (B,))
            box = jnp.broadcast_to(box, (B, H, W))

        partner = jnp.flip(clips, axis=0)
        lam_b = lam[:, None, None, None, None]
        blended = clips * lam_b + partner * (1.0 - lam_b)
        box_b = box[:, None, :, :, None]  # (B, 1, H, W, 1)
        cut = jnp.where(box_b, partner, clips)
        use_cut_b = use_cutmix if self.mode == "elem" else None
        if self.mode == "pair":
            use_cut_b = jnp.concatenate([use_cutmix, use_cutmix[::-1]])
        elif self.mode == "batch":
            use_cut_b = jnp.broadcast_to(use_cutmix, (B,))
        mixed = jnp.where(
            use_cut_b[:, None, None, None, None], cut, blended
        )

        y1 = one_hot_smooth(targets, self.num_classes, self.label_smoothing)
        y2 = jnp.flip(y1, axis=0)
        soft = y1 * lam[:, None] + y2 * (1.0 - lam[:, None])
        return mixed.astype(clips.dtype), soft
