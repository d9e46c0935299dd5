"""Fused LayerNorm + Linear (Pallas, TPU) — built, measured, OFF by
default.

The pre-LN transformer block computes LN(x) @ W at two sites (norm1 ->
qkv projection, norm2 -> fc1). Unfused, the normalized activation makes
an HBM round-trip between the LN kernel and the matmul; fused, each
row's statistics are computed in-register right before its block of the
matmul, so x is read once and only the projection output is written.

Measured verdict (v5e, ViT-B MOFO pretrain step, B=48): a step
REGRESSION at both sites (qkv: 151.9 -> 157.3 ms, fc1: -> 173.3 ms)
despite standalone microbench wins, because a pallas_call is an XLA
fusion boundary: left unfused, XLA folds the LN into adjacent
elementwise work (residual adds, bias), fuses its backward into the
matmul backward, and keeps everything in one scheduled program. Enable
for experiments via MOFO_FUSE_LN (see models/layers._fuse_ln_sites).

Forward is one Pallas kernel (full-K blocks: ViT feature dims 384/768
fit VMEM whole, so no K-loop). Backward is plain jnp: recompute the
rstd/xhat from x (one fused XLA pass) and use standard LN/matmul
gradients — the backward matmuls dominate and XLA's GEMMs are already
optimal there.

Numerics match flax nn.LayerNorm(use_fast_variance=True): statistics in
float32, var = E[x^2] - E[x]^2, y = (x - mu) * rsqrt(var + eps) * gamma
+ beta, output cast to the compute dtype before the matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BM = 256  # token rows per program
# Output columns per program: the FULL width whenever the weight block
# fits VMEM (ViT-B/L qkv/fc1 widths all do). Splitting columns is a trap
# here: every extra column block re-reads the x rows and recomputes
# their LN statistics, and a non-divisor split pads the matmul (e.g.
# 1152 -> 3x512 = 1536, 33% wasted MXU). With one column block the x
# block is read once per row-block, the LN runs once, and the w block is
# grid-invariant so Mosaic keeps it resident across programs.
_BN_MAX = 4096


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def manual_layer_norm(x: Array, gamma: Array, beta: Array,
                      eps: float = 1e-6,
                      dtype=jnp.bfloat16) -> Array:
    """flax nn.LayerNorm(use_fast_variance) math, for the unfused path."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(dtype)


def _ones_dot(t: Array, width: int = 8) -> Array:
    """Row sums over the minor axis as an MXU dot against a constant
    ones matrix (col 0 of the result); XLA's cross-lane reduce runs at
    3-6x its bandwidth floor on v5e, the dot does not. `width` > 1 keeps
    the algebraic simplifier from rewriting the dot back into a reduce
    (it only folds dot-with-vector)."""
    D = t.shape[-1]
    ones = jnp.ones((D, width), t.dtype)
    return jax.lax.dot_general(
        t, ones, (((t.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]


@functools.lru_cache(maxsize=None)
def _make_mmvjp_ln(eps: float, dtype_name: str):
    """LayerNorm with EVERY reduction on the MXU, fwd and bwd.

    Forward: mean / mean-square via _ones_dot. Backward:
      dx      = r * (g*dy - mean_d(g*dy) - xhat * mean_d(g*dy*xhat))
      dgamma  = sum_rows(dy * xhat)  — the diagonal of xhat^T @ dy,
                computed as a (D, D) MXU matmul then sliced (reads each
                operand once; the elementwise+row-reduce XLA emits
                otherwise measures ~4x its traffic floor)
      dbeta   = ones^T @ dy
    Residuals are x plus the tiny per-row (mu, r). bf16 fast path only.
    """
    odt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    def _stats(x):
        D = x.shape[-1]
        s1 = _ones_dot(x)
        x2 = (x.astype(jnp.float32) * x).astype(x.dtype)
        s2 = _ones_dot(x2)
        mu = s1 / D
        var = jnp.maximum(s2 / D - mu * mu, 0.0)
        r = jax.lax.rsqrt(var + eps)
        return mu, r

    def _apply(x, gamma, beta, mu, r):
        a = r[..., None] * gamma.astype(jnp.float32)
        b = (beta.astype(jnp.float32)
             - mu[..., None] * r[..., None] * gamma.astype(jnp.float32))
        return (x.astype(jnp.float32) * a + b).astype(odt)

    @jax.custom_vjp
    def ln(x, gamma, beta):
        mu, r = _stats(x)
        return _apply(x, gamma, beta, mu, r)

    def fwd(x, gamma, beta):
        mu, r = _stats(x)
        return _apply(x, gamma, beta, mu, r), (x, gamma, mu, r)

    def bwd(res, dy):
        x, gamma, mu, r = res
        D = x.shape[-1]
        xf = x.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        xhat = (xf - mu[..., None]) * r[..., None]
        gdy = dyf * gamma.astype(jnp.float32)
        # per-row means over d: MXU dots (bf16 operands, f32 accum)
        m1 = _ones_dot(gdy.astype(x.dtype)) / D  # (rows,)
        m2 = _ones_dot((gdy * xhat).astype(x.dtype)) / D
        dx = (r[..., None]
              * (gdy - m1[..., None] - xhat * m2[..., None]))
        # param grads: contract over ALL leading axes at once
        lead = tuple(range(x.ndim - 1))
        full = jax.lax.dot_general(
            xhat.astype(x.dtype), dy.astype(x.dtype),
            ((lead, lead), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, D); diag = sum_rows(xhat * dy)
        dgamma = jnp.diagonal(full)
        ones_rows = jnp.ones(x.shape[:-1] + (8,), x.dtype)
        dbeta = jax.lax.dot_general(
            ones_rows, dy.astype(x.dtype),
            ((lead, lead), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]  # (8, D) -> row 0
        return dx.astype(x.dtype), dgamma.astype(jnp.float32), \
            dbeta.astype(jnp.float32)

    ln.defvjp(fwd, bwd)
    return ln


def mmvjp_layer_norm(x: Array, gamma: Array, beta: Array,
                     eps: float = 1e-6,
                     dtype=jnp.bfloat16) -> Array:
    """Matmul-everything LayerNorm (see _make_mmvjp_ln)."""
    name = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    return _make_mmvjp_ln(eps, name)(x, gamma, beta)


def mm_stats_layer_norm(x: Array, gamma: Array, beta: Array,
                        eps: float = 1e-6,
                        dtype=jnp.bfloat16) -> Array:
    """LayerNorm whose mean / mean-square ride the MXU.

    XLA lowers the (B, N, D) -> (B, N) LN statistics as cross-lane VPU
    reductions (log-shuffle per tile): the r3 step trace shows the fused
    residual+stats ops at 3-6x their bandwidth floor (0.65 ms where the
    traffic bounds ~0.2). A dot_general against a constant ones matrix
    computes the same sums on the MXU at trivial FLOP cost, and its
    autodiff emits broadcast matmuls instead of lane reduces in the
    backward. bf16 inputs only (the x*x operand rounds through bf16 with
    f32 accumulation — same recipe as the target stats in ops/patchify);
    f32 callers should keep the exact flax path.
    """
    D = x.shape[-1]
    ones = jnp.ones((D, 8), x.dtype)  # 8 lanes; physical tile pads anyway
    s1 = jax.lax.dot_general(
        x, ones, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]  # (B, N) sum(x), exact f32 accumulation of bf16 x
    x2 = (x.astype(jnp.float32) * x).astype(x.dtype)
    s2 = jax.lax.dot_general(
        x2, ones, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    mu = s1 / D
    var = jnp.maximum(s2 / D - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = (rstd[..., None] * gamma.astype(jnp.float32))
    b = (beta.astype(jnp.float32)
         - mu[..., None] * rstd[..., None] * gamma.astype(jnp.float32))
    return (x.astype(jnp.float32) * a + b).astype(dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)  # (bm, D)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _pad_rows(x, m_pad):
    pad = m_pad - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _fwd_impl(x, gamma, beta, w, bias, eps, out_dtype, interpret):
    M, D = x.shape
    n_out = w.shape[1]
    m_pad = -(-M // _BM) * _BM
    bn = min(-(-n_out // 128) * 128, _BN_MAX)
    n_pad = -(-n_out // bn) * bn
    xp = _pad_rows(x, m_pad)
    wp = w if n_pad == n_out else jnp.pad(w, ((0, 0), (0, n_pad - n_out)))
    biasp = (
        bias if n_pad == n_out else jnp.pad(bias, (0, n_pad - n_out))
    )
    grid = (m_pad // _BM, n_pad // bn)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        # full-width w blocks (up to D x 4096 bf16 = 8M) + double-buffered
        # x/out need more than the 16M default scoped budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, gamma[None], beta[None], wp, biasp[None])
    return out[:M, :n_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_linear(x, gamma, beta, w, bias, eps, out_dtype, interpret):
    return _fwd_impl(x, gamma, beta, w, bias, eps, out_dtype, interpret)


def _ln_linear_fwd(x, gamma, beta, w, bias, eps, out_dtype, interpret):
    out = _fwd_impl(x, gamma, beta, w, bias, eps, out_dtype, interpret)
    return out, (x, gamma, beta, w)


def _ln_linear_bwd(eps, out_dtype, interpret, res, g):
    x, gamma, beta, w = res
    gf = g.astype(jnp.float32)
    # recompute the normalization (one fused XLA pass over x)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd  # (M, D)
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    db = jnp.sum(gf, axis=0).astype(w.dtype)
    dw = jnp.einsum(
        "md,mn->dn", y.astype(w.dtype), g.astype(w.dtype),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    dy = jnp.einsum(
        "mn,dn->md", g.astype(w.dtype), w,
        preferred_element_type=jnp.float32,
    )  # (M, D) f32
    dgamma = jnp.sum(dy * xhat, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(dy, axis=0).astype(beta.dtype)
    dxhat = dy * gamma.astype(jnp.float32)
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return (dx.astype(x.dtype), dgamma, dbeta, dw, db)


_ln_linear.defvjp(_ln_linear_fwd, _ln_linear_bwd)


def ln_linear(
    x: Array,
    gamma: Array,
    beta: Array,
    w: Array,
    bias: Array,
    *,
    eps: float = 1e-6,
    out_dtype=None,
    interpret: bool | None = None,
) -> Array:
    """LayerNorm(x; gamma, beta) @ w + bias, fused.

    x: (..., D); w: (D, n_out); bias: (n_out,). Returns (..., n_out) in
    out_dtype (defaults to w.dtype)."""
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = w.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _ln_linear(x2, gamma, beta, w, bias, eps, out_dtype, interpret)
    return out.reshape(lead + (w.shape[1],))
