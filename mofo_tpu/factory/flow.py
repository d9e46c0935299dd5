"""Optical flow for the offline motion-map factory.

The reference shells out to the denseflow TVL1 CUDA binary
(scripts/data/motion_map_creator.py:75). Here:

  - tvl1_flow: TV-L1 (Zach et al. '07 / Sanchez '13) implemented in JAX —
    pyramidal warping + primal-dual iterations as lax loops, batchable
    over frame pairs and jit-compiled, so flow extraction can run on the
    TPU itself instead of a GPU sidecar binary.
  - dis_flow / farneback_flow: OpenCV host fallbacks (this image's cv2
    has no contrib TVL1).

Flow output convention matches denseflow: (H, W, 2) float (dx, dy), which
motion_maps.py then converts to motion-boundary magnitude maps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _grayscale(img: Array) -> Array:
    if img.ndim == 3 and img.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
        return jnp.sum(img * w, axis=-1)
    return img


def _resize2d(x: Array, hw: Tuple[int, int]) -> Array:
    return jax.image.resize(x, hw, method="bilinear")


def _grad(x: Array) -> Tuple[Array, Array]:
    gx = jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (0, 1)))
    gy = jnp.pad(x[1:] - x[:-1], ((0, 1), (0, 0)))
    return gx, gy


def _div(px: Array, py: Array) -> Array:
    dx = px - jnp.pad(px[:, :-1], ((0, 0), (1, 0)))
    dy = py - jnp.pad(py[:-1], ((1, 0), (0, 0)))
    return dx + dy


def _warp(img: Array, u: Array, v: Array) -> Array:
    H, W = img.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    sx = jnp.clip(xs + u, 0.0, W - 1.0)
    sy = jnp.clip(ys + v, 0.0, H - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = sx - x0
    wy = sy - y0

    def at(yy, xx):
        return img[yy.astype(jnp.int32), xx.astype(jnp.int32)]

    top = at(y0, x0) * (1 - wx) + at(y0, x1) * wx
    bot = at(y1, x0) * (1 - wx) + at(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _tvl1_level(
    I0: Array,
    I1: Array,
    u: Array,
    v: Array,
    *,
    tau: float,
    lam: float,
    theta: float,
    n_warps: int,
    n_iters: int,
) -> Tuple[Array, Array]:
    lt = lam * theta

    def warp_body(_, carry):
        u, v, p11, p12, p21, p22 = carry
        I1w = _warp(I1, u, v)
        I1x_full, I1y_full = _grad(I1)
        I1wx = _warp(I1x_full, u, v)
        I1wy = _warp(I1y_full, u, v)
        grad_sq = I1wx**2 + I1wy**2 + 1e-9
        rho_c = I1w - I1wx * u - I1wy * v - I0

        def iter_body(_, carry2):
            u, v, p11, p12, p21, p22 = carry2
            rho = rho_c + I1wx * u + I1wy * v
            # thresholding (pointwise TV-L1 data step)
            d1 = jnp.where(
                rho < -lt * grad_sq,
                lt * I1wx,
                jnp.where(
                    rho > lt * grad_sq,
                    -lt * I1wx,
                    -rho * I1wx / grad_sq,
                ),
            )
            d2 = jnp.where(
                rho < -lt * grad_sq,
                lt * I1wy,
                jnp.where(
                    rho > lt * grad_sq,
                    -lt * I1wy,
                    -rho * I1wy / grad_sq,
                ),
            )
            v1 = u + d1
            v2 = v + d2
            # dual update + flow from divergence
            u_new = v1 + theta * _div(p11, p12)
            v_new = v2 + theta * _div(p21, p22)
            ux, uy = _grad(u_new)
            vx, vy = _grad(v_new)
            taut = tau / theta
            ng1 = 1.0 + taut * jnp.sqrt(ux**2 + uy**2)
            ng2 = 1.0 + taut * jnp.sqrt(vx**2 + vy**2)
            p11 = (p11 + taut * ux) / ng1
            p12 = (p12 + taut * uy) / ng1
            p21 = (p21 + taut * vx) / ng2
            p22 = (p22 + taut * vy) / ng2
            return (u_new, v_new, p11, p12, p21, p22)

        return jax.lax.fori_loop(
            0, n_iters, iter_body, (u, v, p11, p12, p21, p22)
        )

    zeros = jnp.zeros_like(u)
    u, v, *_ = jax.lax.fori_loop(
        0, n_warps, warp_body, (u, v, zeros, zeros, zeros, zeros)
    )
    return u, v


@functools.partial(
    jax.jit,
    static_argnames=("n_scales", "n_warps", "n_iters"),
)
def tvl1_flow(
    prev: Array,
    nxt: Array,
    *,
    tau: float = 0.25,
    lam: float = 0.15,
    theta: float = 0.3,
    n_scales: int = 4,
    n_warps: int = 8,
    n_iters: int = 100,
) -> Array:
    """TV-L1 optical flow. prev/nxt: (H, W[, 3]) uint8 or float.
    Returns (H, W, 2) float32 (dx, dy)."""
    I0 = _grayscale(prev.astype(jnp.float32)) / 255.0
    I1 = _grayscale(nxt.astype(jnp.float32)) / 255.0
    H, W = I0.shape
    shapes = []
    for s in range(n_scales):
        f = 0.5**s
        shapes.append((max(int(round(H * f)), 16),
                       max(int(round(W * f)), 16)))
    u = jnp.zeros(shapes[-1])
    v = jnp.zeros(shapes[-1])
    for s in reversed(range(n_scales)):
        hw = shapes[s]
        if u.shape != hw:
            scale_x = hw[1] / u.shape[1]
            scale_y = hw[0] / u.shape[0]
            u = _resize2d(u, hw) * scale_x
            v = _resize2d(v, hw) * scale_y
        I0s = _resize2d(I0, hw)
        I1s = _resize2d(I1, hw)
        u, v = _tvl1_level(
            I0s, I1s, u, v, tau=tau, lam=lam, theta=theta,
            n_warps=n_warps, n_iters=n_iters,
        )
    return jnp.stack([u, v], axis=-1)


def tvl1_flow_batch(frames: Array, **kw) -> Array:
    """Consecutive-pair flow for a clip (T, H, W[, 3]) -> (T-1, H, W, 2)."""
    return jax.vmap(lambda a, b: tvl1_flow(a, b, **kw))(
        frames[:-1], frames[1:]
    )


# ---------------------------------------------------------------------------
# OpenCV host fallbacks
# ---------------------------------------------------------------------------


def dis_flow(prev: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    import cv2

    g0 = cv2.cvtColor(prev, cv2.COLOR_RGB2GRAY) if prev.ndim == 3 else prev
    g1 = cv2.cvtColor(nxt, cv2.COLOR_RGB2GRAY) if nxt.ndim == 3 else nxt
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    return dis.calc(g0, g1, None)


def farneback_flow(prev: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    import cv2

    g0 = cv2.cvtColor(prev, cv2.COLOR_RGB2GRAY) if prev.ndim == 3 else prev
    g1 = cv2.cvtColor(nxt, cv2.COLOR_RGB2GRAY) if nxt.ndim == 3 else nxt
    return cv2.calcOpticalFlowFarneback(
        g0, g1, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )


def compute_flow(prev: np.ndarray, nxt: np.ndarray,
                 backend: str = "tvl1") -> np.ndarray:
    if backend == "tvl1":
        return np.asarray(tvl1_flow(jnp.asarray(prev), jnp.asarray(nxt)))
    if backend == "dis":
        return dis_flow(prev, nxt)
    if backend == "farneback":
        return farneback_flow(prev, nxt)
    raise ValueError(backend)
