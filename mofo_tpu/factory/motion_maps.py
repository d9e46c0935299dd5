"""Motion-boundary magnitude maps from optical flow.

Behavioral parity with scripts/motion_sts.py:5-60 and the sliding-window
driver in scripts/data/motion_map_creator.py:121-242:
  - convolve each flow image with the Sobel-like mx/my kernels
  - sum boundaries over a temporal window (ws=8; 4 for Kinetics)
  - magnitude via cartesian->polar
  - zero an 8-px border
  - block-mean downsample to a size x size grid

Two implementations: a numpy transcription (host, per window) and a
batched jit version (vmapped over windows) for on-device factory runs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MX = np.array([[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]], dtype=np.float64)
MY = np.array([[-1, -1, -1], [0, 0, 0], [1, 1, 1]], dtype=np.float64)


def compute_motion_boundary_np(flow_clip: Sequence[np.ndarray]):
    """scripts/motion_sts.py:5-27 transcription (scipy reflect-mode
    convolution, which flips the kernel)."""
    from scipy import ndimage

    mb_x = 0.0
    mb_y = 0.0
    for flow_img in flow_clip:
        mb_x = mb_x + ndimage.convolve(flow_img, MX)
        mb_y = mb_y + ndimage.convolve(flow_img, MY)
    return mb_x, mb_y


def zero_boundary_np(mag: np.ndarray, border: int = 8) -> np.ndarray:
    mag = mag.copy()
    mag[:border, :] = 0
    mag[:, :border] = 0
    mag[-border:, :] = 0
    mag[:, -border:] = 0
    return mag


def downsample_np(mag: np.ndarray, size: int, input_size: int) -> np.ndarray:
    block = input_size // size
    out = np.zeros((size, size))
    for i in range(size):
        for j in range(size):
            out[i, j] = mag[
                i * block:(i + 1) * block, j * block:(j + 1) * block
            ].mean()
    return out


def motion_sts_np(
    flow_clip: Sequence[np.ndarray], size: int, input_size: int
) -> np.ndarray:
    """Full motion_sts (scripts/motion_sts.py:54-60): per-window motion
    magnitude downsampled to (size, size)."""
    import cv2

    mb_x, mb_y = compute_motion_boundary_np(flow_clip)
    mag, _ = cv2.cartToPolar(
        mb_x.astype(np.float64), mb_y.astype(np.float64),
        angleInDegrees=True,
    )
    return downsample_np(mag, size, input_size)


def motion_magnitude_frames_np(
    flow_frames: Sequence[np.ndarray], window: int = 8
) -> List[np.ndarray]:
    """Sliding-window magnitude per frame (motion_map_creator.py:121-242):
    frame i's map is the boundary sum over flow[i - w//2 : i + w//2],
    border-zeroed, normalized to [0, 255]."""
    n = len(flow_frames)
    out = []
    half = window // 2
    for i in range(n):
        lo = max(0, i - half)
        hi = min(n, i + half)
        mb_x, mb_y = compute_motion_boundary_np(flow_frames[lo:hi])
        mag = np.sqrt(mb_x**2 + mb_y**2)
        mag = zero_boundary_np(mag)
        peak = mag.max()
        if peak > 0:
            mag = mag / peak * 255.0
        out.append(mag.astype(np.uint8))
    return out


# ---------------------------------------------------------------------------
# Batched on-device version
# ---------------------------------------------------------------------------


def _conv2_reflect(x: Array, k: Array) -> Array:
    """scipy.ndimage.convolve parity: kernel flip + scipy-'reflect'
    padding (edge-repeating, i.e. numpy 'symmetric')."""
    kf = jnp.flip(k)
    xp = jnp.pad(x, 1, mode="symmetric")
    return jax.lax.conv_general_dilated(
        xp[None, None], kf[None, None].astype(x.dtype), (1, 1), "VALID"
    )[0, 0]


def motion_boundary_jax(flow: Array) -> Array:
    """flow: (T, H, W) single-component flow images -> summed |boundary|
    components (2, H, W)."""
    mx = jnp.asarray(MX, flow.dtype)
    my = jnp.asarray(MY, flow.dtype)
    dx = jax.vmap(lambda f: _conv2_reflect(f, mx))(flow).sum(0)
    dy = jax.vmap(lambda f: _conv2_reflect(f, my))(flow).sum(0)
    return jnp.stack([dx, dy])


def motion_sts_jax(flow: Array, size: int, input_size: int) -> Array:
    """Jit-friendly motion_sts: flow (T, H, W) -> (size, size) map."""
    mb = motion_boundary_jax(flow)
    mag = jnp.sqrt(mb[0] ** 2 + mb[1] ** 2)
    block = input_size // size
    mag = mag[: size * block, : size * block]
    return jnp.mean(
        mag.reshape(size, block, size, block), axis=(1, 3)
    )
