"""Fused attention kernels (Pallas, TPU).

Design point: MOFO sequence lengths are short (160 visible tokens for the
pretrain encoder, 1568 for the decoder / finetune backbone; 6k+ only for
32-frame/384px variants) and head_dim is 64 across the family. Full K/V
for one (batch, head) fits comfortably in VMEM, so each q-block computes
its complete softmax row in a single pass — no online-softmax streaming —
while still never materializing the (N, N) probability matrix in HBM.
That's where the win over the XLA path comes from: the naive einsum
attention round-trips B*H*N^2 floats of logits+probs through HBM
(1.9 GB at B=32 for the decoder); the fused kernel keeps them in VMEM.

Backward follows the standard flash-attention recipe (recompute P per
block; dS = P o (dP - D); two kernels: dq over q-blocks, dk/dv over
kv-blocks) with the row logsumexp saved from the forward.

Inputs (B, N, H, D) as produced by models/layers.Attention; non-causal,
no mask — the padded tail is masked inside the kernels via iota
comparisons. interpret=True (automatic off-TPU) runs the same kernels
under the Pallas interpreter for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mofo_tpu.ops.sharded_kernel import batch_dim0_call

Array = jax.Array

_BLOCK_Q = 256
_NEG_INF = -1e30
# exp(x) lowers to exp2(x * log2e) on the TPU VPU: folding log2e into the
# score scale and working in base 2 (exp2/log2) deletes one full-size
# (bq, Nk) VPU multiply per tile in the softmax and one in every backward
# p-recompute. Enabled on the bf16 fast path only (base2=True) — numerics
# differ from exp() by rounding ULPs, so the f32 parity path keeps exp.
_LOG2E = 1.4426950408889634


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _block_for(n: int, heads: int = 1) -> int:
    """Pick a q/kv block size that divides n exactly when possible.

    A divisor block means n_pad == n: no padded kv columns burning MXU
    cycles in every score matmul (the fixed 256 block pads the 1568-token
    decoder to 1792 — 14% wasted flops — and the 160-token encoder to
    256), and the in-kernel column masks become no-ops.

    heads is the per-program head count of the CALLING kernel (the
    multihead kernels loop heads in one program; fwd and bwd must agree
    because the saved lse layout carries bq). Measured on the 1568-token
    geometries (full-step A/B):
      6 heads (pretrain decoder):    784 > 392 ≈ 256-padded   -> fat
      12 heads (classifier blocks):  224 (233.4 ms) > 784/392/112
        (238.4/238.6/238.7 ms) — twelve heads' live score tiles want
        small blocks; the h-outer backward keeps one head's set live
        either way.

    MOFO_FLASH_BLOCK overrides the choice (perf experiments) when it
    divides n and is 8-row aligned.
    """
    import os

    env = os.environ.get("MOFO_FLASH_BLOCK")
    if env and n > 512 and n % int(env) == 0 and int(env) % 8 == 0:
        return int(env)
    if n % 8 == 0:
        lane_pad = -(-n // 128) * 128  # physical kv width after Mosaic
        pad256 = -(-n // 256) * 256  # kv width with 256 blocks
        if pad256 == lane_pad and (heads <= 8 or n <= 2048):
            # padding to 256 blocks is free (it IS the lane-aligned
            # width, e.g. the 160-token encoder -> 256) and 256-row q
            # blocks pipeline better on the MXU than odd divisors —
            # EXCEPT at >8-head long-kv geometries, where the divisor
            # search below wins: the 12-head N=4608 (384px classifier)
            # measures 426.7 ms with 384-row blocks vs 457.1 with 256
            # (full step, B=8, round 5)
            return _BLOCK_Q
        if n <= 512:
            return n  # single q block
        # Divisor-block search. Fat blocks (fewer programs, amortized
        # prologue/epilogue DMA) win at <=8 heads; >8 heads prefer
        # <=256-row blocks at the 1568-token geometries (docstring A/B)
        # but LONG kv amortizes differently: at the 12-head 3136-token
        # (32-frame) classifier, 448 measured 367.5 ms vs 224's 422.3
        # (full step, B=12) and 784 OOMs VMEM even at the full budget.
        # The >8-head long-kv cap is 448, not 512: at 12-head N=4608
        # (384px classifier) 384-row blocks measure 426.7 ms vs 512's
        # 457.1 (full step, B=8, round 5) — cap 448 keeps 448 at
        # N=3136 (divides) and picks 384 at N=4608; 392 at N=3136
        # measured worse (502.6).
        top = (256 if n <= 2048 else 448) if heads > 8 else 1024
        # the f32 (blk, lane_pad) score-tile cap: 6M generally, 8M for
        # >8-head long kv (admits 384 at N=4608, whose 7.08M tile runs
        # fine inside the 80/100M long-kv VMEM tiers — measured round 5)
        tile_cap = (8 if heads > 8 and n > 2048 else 6) * 1024 * 1024
        for blk in range(top, 63, -8):  # e.g. 1568 -> 784 / 224
            if n % blk == 0 and blk * lane_pad * 4 <= tile_cap:
                return blk
    return _BLOCK_Q  # fallback: pad to 256 blocks and mask



def _vmem_mb(default_mb: int) -> int:
    """Scoped-VMEM budget in MB. The tier constants are sized for the
    DEFAULT block choices (_block_for); an explicit MOFO_FLASH_BLOCK
    override changes per-program working sets in ways the tiers don't
    model (e.g. 392-row blocks at 12 heads measured 34M against the
    24M small-block tier), so expert-mode overrides get the full
    budget instead of a crash. Production compiles are unaffected."""
    import os

    if os.environ.get("MOFO_FLASH_BLOCK"):
        return max(default_mb, 110)
    return default_mb


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, n_valid):
    # q: (1, bq, D) block; k, v: (1, Nk, D); o: (1, bq, D);
    # lse: (1, 1, 8, bq) block of a (BH, nq, 8, bq) array — the row is
    # replicated over the 8 sublanes because Mosaic cannot do dynamic
    # sublane-indexed stores into a (BH, n_pad) layout.
    # fold scale into the (bq, D) q operand — one small VPU pass instead
    # of scaling the (bq, Nk) score matrix (matches xla_attention, which
    # also scales q)
    q = q_ref[0] * q_ref.dtype.type(scale)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, Nk)
    if n_valid is not None:  # static: only when kv rows are padded
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)
    lse_row = (m[:, 0] + jnp.log(l[:, 0]))[None, :]  # (1, bq)
    lse_ref[0, 0] = jnp.broadcast_to(lse_row, (8, lse_row.shape[1]))


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale, n_valid):
    # bf16 matmul operands + f32 accumulation throughout (f32 operands
    # would run the MXU at 1/4 of bf16 peak); p/ds math stays f32 on the
    # VPU
    # scale folds into the (., D) operands: qs for the score recompute,
    # ks for the dq matmul — two small VPU passes replace two (bq, Nk)
    # passes (s * scale and ds * scale)
    qs = q_ref[0] * q_ref.dtype.type(scale)
    k = k_ref[0]
    ks = k * k_ref.dtype.type(scale)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, 0]
    delta = delta_ref[0, 0, 0]
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if k.dtype == jnp.bfloat16:
        # bf16 dS product (f32 cancellation-sensitive subtract kept,
        # half-width multiply) — same treatment the fused kernels got
        # in round 5 (-0.85 ms/step at B=80, loss shift 8.7e-8); the
        # blocked kernels serve the >2048-token callers (32f / 384px)
        ds = p.astype(jnp.bfloat16) * (
            dp - delta[:, None]
        ).astype(jnp.bfloat16)
    else:
        ds = (p * (dp - delta[:, None])).astype(k.dtype)
    dq = jax.lax.dot_general(
        ds, ks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, n_valid):
    # k, v: (1, bk, D) blocks; q, do: (1, Nq, D) full; lse/delta:
    # (1, nq, 8, bq) with +inf lse on padded rows so their P contribution
    # is exactly zero. Statically unrolled loop over q blocks (Mosaic has
    # no general reshape for flattening the lse tiles).
    k = k_ref[0]
    v = v_ref[0]
    bk, D = k.shape
    nq = lse_ref.shape[1]
    bq = lse_ref.shape[3]
    dk_acc = jnp.zeros((bk, D), jnp.float32)
    dv_acc = jnp.zeros((bk, D), jnp.float32)
    for qi in range(nq):
        # bf16 matmul operands + f32 accumulation; scale folded into the
        # (bq, D) q operand, which both the score recompute and the dk
        # matmul consume (see _mh_dqkv_kernel)
        qb = q_ref[0, pl.ds(qi * bq, bq), :] * q_ref.dtype.type(scale)
        dob = do_ref[0, pl.ds(qi * bq, bq), :]
        lse = lse_ref[0, qi, 0]
        delta = delta_ref[0, qi, 0]
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        p = jnp.exp(s - lse[:, None])  # padded rows -> exp(-inf) = 0
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dob, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        if k.dtype == jnp.bfloat16:
            # bf16 dS product, f32 subtract — see _dq_kernel
            ds = p.astype(jnp.bfloat16) * (
                dp - delta[:, None]
            ).astype(jnp.bfloat16)
        else:
            ds = (p * (dp - delta[:, None])).astype(k.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _pad_to(x: Array, n: int, axis: int) -> Array:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_impl(q, k, v, scale, interpret):
    """q, k, v: (BH, N, D). Returns (out, lse)."""
    BH, N, D = q.shape
    bq = _block_for(N)
    n_pad = -(-N // bq) * bq
    n_valid = N if n_pad != N else None
    qp = _pad_to(q, n_pad, 1)
    kp = _pad_to(k, n_pad, 1)
    vp = _pad_to(v, n_pad, 1)
    nq = n_pad // bq

    def call(qp, kp, vp):
        bh = qp.shape[0]  # LOCAL batch*heads under SPMD partitioning
        return tuple(pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, bq), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype),
                jax.ShapeDtypeStruct((bh, nq, 8, bq), jnp.float32),
            ],
            interpret=interpret,
        )(qp, kp, vp))

    out, lse4 = batch_dim0_call(call, qp, kp, vp)
    lse = lse4[:, :, 0, :].reshape(BH, n_pad)
    return out[:, :N], lse


def _bwd_impl(q, k, v, out, lse, do, scale, interpret):
    BH, N, D = q.shape
    bq = _block_for(N)
    n_pad = -(-N // bq) * bq
    n_valid = N if n_pad != N else None
    qp = _pad_to(q, n_pad, 1)
    kp = _pad_to(k, n_pad, 1)
    vp = _pad_to(v, n_pad, 1)
    dop = _pad_to(do, n_pad, 1)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (BH, N)
    deltap = _pad_to(delta, n_pad, 1)
    # +inf lse on padded rows zeroes their contribution in the dkv kernel
    lsep = _pad_to(lse, n_pad, 1)
    if n_valid is not None:
        row = jnp.arange(n_pad)[None, :]
        lsep = jnp.where(row < N, lsep, jnp.inf)
    nq = n_pad // bq
    lse4 = jnp.broadcast_to(
        lsep.reshape(BH, nq, 1, bq), (BH, nq, 8, bq)
    )
    delta4 = jnp.broadcast_to(
        deltap.reshape(BH, nq, 1, bq), (BH, nq, 8, bq)
    )

    def call_dq(qp, kp, vp, dop, lse4, delta4):
        bh = qp.shape[0]  # LOCAL batch*heads under SPMD partitioning
        return pl.pallas_call(
            functools.partial(_dq_kernel, scale=scale, n_valid=n_valid),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, bq), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, bq), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype),
            interpret=interpret,
        )(qp, kp, vp, dop, lse4, delta4)

    dq = batch_dim0_call(call_dq, qp, kp, vp, dop, lse4, delta4)

    def call_dkv(qp, kp, vp, dop, lse4, delta4):
        bh = qp.shape[0]
        return tuple(pl.pallas_call(
            functools.partial(_dkv_kernel, scale=scale, n_valid=n_valid),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq, 8, bq), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq, 8, bq), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype),
                jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype),
            ],
            interpret=interpret,
        )(qp, kp, vp, dop, lse4, delta4))

    dk, dv = batch_dim0_call(call_dkv, qp, kp, vp, dop, lse4, delta4)
    return dq[:, :N], dk[:, :N], dv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    out, _ = _fwd_impl(q, k, v, scale, interpret)
    return out


def _flash_fwd(q, k, v, scale, interpret):
    out, lse = _fwd_impl(q, k, v, scale, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, interpret, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, out, lse, do, scale, interpret)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def _f16_boundary(q, k, v):
    """Mosaic has no f16 type; fp16 callers (--dtype float16, the
    DeepSpeed-parity finetune mode) run the kernels on bf16 operands
    instead of falling back to XLA attention (VERDICT r4 #8). The
    matmuls accumulate f32 either way, so only the operand quantization
    changes (bf16's 8 mantissa bits vs f16's 11 — comparable to the
    reference's f16 cuDNN attention); autodiff of astype casts the
    cotangents back to f16. Returns (q, k, v, out_cast)."""
    if q.dtype == jnp.float16:
        return (q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), jnp.float16)
    return q, k, v, None


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: float,
    interpret: bool | None = None,
) -> Array:
    """Fused attention. q, k, v: (B, H, N, D) head-major -> same layout.
    The (B*H, N, D) kernel view is a free reshape in this layout."""
    if interpret is None:
        interpret = not _on_tpu()
    q, k, v, out_cast = _f16_boundary(q, k, v)
    if out_cast is not None:
        return flash_attention(
            q, k, v, scale=scale, interpret=interpret
        ).astype(out_cast)
    B, H, N, D = q.shape
    qt = q.reshape(B * H, N, D)
    kt = k.reshape(B * H, N, D)
    vt = v.reshape(B * H, N, D)
    out = _flash(qt, kt, vt, scale, interpret)
    return out.reshape(B, H, N, D)


# ---------------------------------------------------------------------------
# Multihead flat-layout kernels: q/k/v as (B, N, H*D) with a static in-kernel
# head loop over 64-lane slices.
#
# Why: the (B, N, H*D) token-major layout is what the qkv projection produces
# as ONE flat MXU matmul and what the output projection consumes — measured
# ~2x faster than the strided head-major einsum, with zero transposes in the
# module. Each program also loads K/V once for ALL heads (H x less DMA than
# the per-(batch, head) grid above).
# ---------------------------------------------------------------------------


def _mh_fwd_kernel(q_ref, k_ref, v_ref, *refs, scale, n_valid, heads,
                   base2=False, has_bias=False):
    # q: (1, bq, H*D); k, v: (1, Nk, H*D); o: (1, bq, H*D);
    # lse: (1, 1, H, 8, bq) — per-head row logsumexp, replicated over the
    # 8 sublanes (same Mosaic constraint as the head-major kernel above).
    # base2: scores carry a folded log2e and lse is stored in base-2
    # units — exp2/log2 replace exp/log (see _LOG2E).
    # has_bias: an extra (1, 8, Nk) f32 input ref follows v — a per-kv-
    # position additive bias row (0 / -1e30), shared across heads and q
    # rows. It is added AFTER the scale fold (the mask values are huge
    # negatives in either base), which is what masks kv columns exactly
    # (their p underflows to 0). Used by the masked cross-attention of
    # the BB-focused classifier (reference modeling_finetune.py:100-160
    # runs ragged per-sample attention; the bias row is the batched
    # equivalent).
    if has_bias:
        bias_ref, o_ref, lse_ref = refs
    else:
        o_ref, lse_ref = refs
    hd = q_ref.shape[-1] // heads
    s_scale = scale * _LOG2E if base2 else scale
    exp_fn = jnp.exp2 if base2 else jnp.exp
    log_fn = jnp.log2 if base2 else jnp.log

    def score(h):
        # scale folds into the (bq, hd) q operand, not the (bq, Nk)
        # score matrix (one small VPU pass; matches xla_attention)
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0][:, sl] * q_ref.dtype.type(s_scale)
        s = jax.lax.dot_general(
            qh, k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if n_valid is not None:  # static: only when kv rows are padded
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        if has_bias:
            s = s + bias_ref[0, 0:1, :]  # (1, Nk) broadcast over q rows
        return s

    # software pipelining: issue head h+1's score matmul before head h's
    # VPU softmax so the MXU overlaps the max/exp/sum work
    s_next = score(0)
    for h in range(heads):
        s = s_next
        if h + 1 < heads:
            s_next = score(h + 1)
        sl = slice(h * hd, (h + 1) * hd)
        vh = v_ref[0][:, sl]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = exp_fn(s - m)  # exp2((s-m)*log2e) == exp(s-m) when base2
        l = jnp.sum(p, axis=-1, keepdims=True)
        # fold the 1/l normalization into the (bq, D) output instead of
        # dividing the full (bq, Nk) probability block (VPU savings)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse_row = (m[:, 0] + log_fn(l[:, 0]))[None, :]
        lse_ref[0, 0, h] = jnp.broadcast_to(lse_row, (8, lse_row.shape[1]))


def _mh_dqkv_kernel(q_ref, k_ref, v_ref, do_ref, ld_ref, *refs,
                    scale, n_valid, heads, base2=False, has_bias=False):
    # ONE backward pass for dq, dk, dv: grid (B, nk), sequential over kv
    # blocks. k/v/dk/dv: (1, bk, H*D) blocks; q/do/dq: (1, Nq, H*D) full
    # (dq is a float32 VMEM accumulator revisited across the nk steps —
    # zeroed at ki == 0). Computing s/P once per (q-block, kv-block, head)
    # serves all three gradients: 5 matmuls + 1 exp per tile, vs 7
    # matmuls + 2 exps for the split dq/dkv formulation.
    # ld: (1, nq, 2*heads, bq) — rows [0, H) are per-head lse, rows
    # [H, 2H) are per-head delta. Compact (no 8-sublane replication) to
    # stay inside the VMEM budget; +inf lse on padded q rows makes their
    # P (and so all their contributions) exactly zero.
    # dq accumulates in float32 VMEM *scratch* (single-buffered, unlike
    # outputs) and is written to the bf16 output once, at the last step.
    # has_bias: extra (1, 8, bk) f32 input after ld — this kv block's
    # slice of the additive bias row; added to every score recompute so
    # masked columns keep p = 0 (their dk/dv/dq contributions vanish,
    # and the bias itself carries no gradient).
    if has_bias:
        bias_ref = refs[0]
        dq_ref, dk_ref, dv_ref, dq_acc_ref = refs[1:]
    else:
        dq_ref, dk_ref, dv_ref, dq_acc_ref = refs
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ki == 0)
    def _zero():
        dq_acc_ref[...] = jnp.zeros(dq_acc_ref.shape, dq_acc_ref.dtype)

    A = k_ref.shape[-1]
    hd = A // heads
    bk = k_ref.shape[1]
    nq = ld_ref.shape[1]
    bq = ld_ref.shape[3]
    k0 = ki * bk
    # base2: q carries scale*log2e (for the base-2 score recompute AND
    # the dk matmul — dk is rescaled by 1/log2e once at the final write);
    # k carries the TRUE scale for dq. exp -> exp2 saves the internal
    # x*log2e multiply on every (bq, bk) tile.
    s_scale = scale * _LOG2E if base2 else scale
    exp_fn = jnp.exp2 if base2 else jnp.exp
    dk_fix = jnp.float32(1.0 / _LOG2E) if base2 else None
    ds16 = base2  # bf16 dS product: measured -0.85 ms/step at B=80
    dk_acc = [jnp.zeros((bk, hd), jnp.float32) for _ in range(heads)]
    dv_acc = [jnp.zeros((bk, hd), jnp.float32) for _ in range(heads)]
    # per-head k/v slices are qi-invariant: slice (and scale) them once
    kh_all = [k_ref[0][:, h * hd:(h + 1) * hd] for h in range(heads)]
    khs_all = [kh * kh.dtype.type(scale) for kh in kh_all]
    vh_all = [v_ref[0][:, h * hd:(h + 1) * hd] for h in range(heads)]
    def score(qh, h):
        s = jax.lax.dot_general(
            qh, kh_all[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        if n_valid is not None:
            col = k0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        if has_bias:
            # (1, bk) row for THIS kv block, broadcast over q rows
            s = s + bias_ref[0, 0, 0:1, :]
        return s

    for qi in range(nq):
        qb = q_ref[0, pl.ds(qi * bq, bq), :]
        dob = do_ref[0, pl.ds(qi * bq, bq), :]
        # every matmul takes bf16 (input-dtype) operands with f32
        # accumulation (preferred_element_type): f32 operands would run
        # the MXU at 1/4 of bf16 peak. p and ds are computed in f32 on
        # the VPU, then cast back down for the matmuls — the standard
        # fused flash-backward recipe. scale folds into the (., hd)
        # operands qh / khs — two small passes instead of two (bq, bk)
        # ones.
        qh_all = [
            qb[:, h * hd:(h + 1) * hd] * qb.dtype.type(s_scale)
            for h in range(heads)
        ]
        doh_all = [dob[:, h * hd:(h + 1) * hd] for h in range(heads)]
        dq_pieces = []
        # software pipelining: issue head h+1's score matmul and the
        # independent dp matmul before head h's VPU softmax/ds work so
        # the MXU stays fed while the VPU runs exp / (dp - delta) * p.
        # (lookahead-1, not all-heads: the full-depth variant measured
        # the same 130.2 ms and its 6 live f32 score tiles OOM scoped
        # VMEM for f32 callers)
        s_next = score(qh_all[0], 0)
        for h in range(heads):
            s = s_next
            if h + 1 < heads:
                s_next = score(qh_all[h + 1], h + 1)
            doh = doh_all[h]
            dp = jax.lax.dot_general(
                doh, vh_all[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lse = ld_ref[0, qi, h]
            delta = ld_ref[0, qi, heads + h]
            # (bf16 exp measured identical to f32 exp — Mosaic upcasts)
            p = exp_fn(s - lse[:, None])
            p16 = p.astype(doh.dtype)
            dv_acc[h] = dv_acc[h] + jax.lax.dot_general(
                p16, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ds16:  # f32 cancellation-sensitive subtract, bf16 product
                ds = p16 * (dp - delta[:, None]).astype(p16.dtype)
            else:
                ds = (p * (dp - delta[:, None])).astype(qb.dtype)
            dk_acc[h] = dk_acc[h] + jax.lax.dot_general(
                ds, qh_all[h], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_pieces.append(jax.lax.dot_general(
                ds, khs_all[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dq_blk = jnp.concatenate(dq_pieces, axis=-1)  # (bq, A) f32
        cur = dq_acc_ref[pl.ds(qi * bq, bq), :]
        dq_acc_ref[pl.ds(qi * bq, bq), :] = cur + dq_blk
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        dk_h = dk_acc[h] if dk_fix is None else dk_acc[h] * dk_fix
        dk_ref[0, :, sl] = dk_h.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc[h].astype(dv_ref.dtype)

    @pl.when(ki == nk - 1)
    def _emit_dq():
        dq_ref[0] = dq_acc_ref[...].astype(dq_ref.dtype)


def _mh_fwd_impl(q, k, v, scale, heads, interpret, kv_bias=None):
    """q, k, v: (B, N, H*D). Returns (out, lse (B, nq, H, 8, BQ)).

    kv_bias: optional (B, N) f32 additive bias per kv position (0 or
    -1e30 mask values), shared across heads/queries — see _mh_fwd_kernel.
    """
    B, N, A = q.shape
    bq = _block_for(N, heads)
    n_pad = -(-N // bq) * bq
    n_valid = N if n_pad != N else None
    qp = _pad_to(q, n_pad, 1)
    kp = _pad_to(k, n_pad, 1)
    vp = _pad_to(v, n_pad, 1)
    nq = n_pad // bq
    base2 = q.dtype == jnp.bfloat16
    has_bias = kv_bias is not None
    bias_ops = ()
    if has_bias:
        biasp = _pad_to(kv_bias.astype(jnp.float32), n_pad, 1)
        bias_ops = (jnp.broadcast_to(biasp[:, None, :], (B, 8, n_pad)),)

    def call(qp, kp, vp, *bias8):
        # batch extent from the operand: under SPMD partitioning
        # (sharded_kernel.batch_dim0_call) this is the LOCAL shard
        b = qp.shape[0]
        out, lse = pl.pallas_call(
            functools.partial(
                _mh_fwd_kernel, scale=scale, n_valid=n_valid, heads=heads,
                base2=base2, has_bias=has_bias,
            ),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + ([
                pl.BlockSpec((1, 8, n_pad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] if has_bias else []),
            out_specs=[
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, heads, 8, bq),
                             lambda b, i: (b, i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n_pad, A), q.dtype),
                jax.ShapeDtypeStruct((b, nq, heads, 8, bq), jnp.float32),
            ],
            # divisor q-blocks (e.g. 392 at the 1568-token decoder)
            # carry larger f32 score transients than the old padded-256
            # blocks, and the lookahead-1 score pipeline keeps TWO live
            # f32 (bq, Nk) tiles: the 12-head finetune geometry needs
            # 58.4M (measured OOM at the old 48M limit)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_mb(
                    # long-kv geometries (32-frame / 3136-token
                    # variants) keep full k/v rows + two live
                    # (bq, Nk) f32 score tiles even at small
                    # divisor blocks: 6-head N=3136 at bq=448
                    # measures 29.2M vs the 24M short-kv tier
                    80 if (bq > 512 or n_pad > 2048)
                    # >8-head long-kv fwd: the unrolled head
                    # loop's live score tiles aren't buffer-
                    # shared (ViT-L classifier 16h/N=1568/bq=224
                    # measures 32.0M vs the 24M short-kv tier)
                    else (40 if heads > 8 and n_pad > 512 else 24)
                ) * 1024 * 1024,
                # every (batch, q-block) program is independent — let
                # Mosaic pipeline DMA across both grid dims
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kp, vp, *bias8)
        return out, lse

    out, lse = batch_dim0_call(call, qp, kp, vp, *bias_ops)
    return out[:, :N], lse


def _mh_bwd_impl(q, k, v, out, lse, do, scale, heads, interpret,
                 kv_bias=None):
    B, N, A = q.shape
    hd = A // heads
    bq = _block_for(N, heads)
    n_pad = -(-N // bq) * bq
    n_valid = N if n_pad != N else None
    nq = n_pad // bq
    qp = _pad_to(q, n_pad, 1)
    kp = _pad_to(k, n_pad, 1)
    vp = _pad_to(v, n_pad, 1)
    dop = _pad_to(do, n_pad, 1)

    # per-head delta = sum_d do_h * out_h : (B, N, H)
    delta = jnp.sum(
        (do.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            B, N, heads, hd
        ),
        axis=-1,
    )
    deltap = _pad_to(delta, n_pad, 1)  # (B, n_pad, H)
    delta4 = deltap.reshape(B, nq, bq, heads).transpose(0, 1, 3, 2)
    # +inf lse on padded q rows zeroes their contribution in the kernel
    lse4 = lse[:, :, :, 0, :]  # (B, nq, H, BQ) — drop sublane replication
    if n_valid is not None:
        row4 = jnp.arange(n_pad).reshape(1, nq, 1, bq)
        lse4 = jnp.where(row4 < N, lse4, jnp.inf)
    # compact (B, nq, 2H, BQ): rows [0,H) lse, rows [H,2H) delta
    ld = jnp.concatenate([lse4, delta4], axis=2)
    # must match the forward's choice — the saved lse is in base-2 units
    # exactly when the forward ran base2 (bf16)
    base2 = q.dtype == jnp.bfloat16
    has_bias = kv_bias is not None
    bias_ops = ()
    if has_bias:
        # (B, nk, 8, bq): one 8-sublane-replicated row per kv block, so
        # the per-block BlockSpec's last-two dims equal the array's
        # (Mosaic forbids partial minor-dim blocks that aren't 128-
        # aligned — bq=784 isn't)
        biasp = _pad_to(kv_bias.astype(jnp.float32), n_pad, 1)
        bias_ops = (jnp.broadcast_to(
            biasp.reshape(B, nq, 1, bq), (B, nq, 8, bq)
        ),)

    def call(qp, kp, vp, dop, ld, *bias8):
        b = qp.shape[0]  # LOCAL batch under SPMD partitioning
        return tuple(pl.pallas_call(
            functools.partial(
                _mh_dqkv_kernel, scale=scale, n_valid=n_valid, heads=heads,
                base2=base2, has_bias=has_bias,
            ),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq, 2 * heads, bq),
                             lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + ([
                # this kv block's slice of the bias row
                pl.BlockSpec((1, 1, 8, bq), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] if has_bias else []),
            out_specs=[
                # dq: full-row float32 accumulator, revisited (and kept
                # in VMEM) across the sequential kv-block steps
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n_pad, A), q.dtype),
                jax.ShapeDtypeStruct((b, n_pad, A), q.dtype),
                jax.ShapeDtypeStruct((b, n_pad, A), q.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((n_pad, A), jnp.float32)],
            # the unrolled (q-block x head) loop carries long-lived f32
            # accumulators; the default 16M scoped-vmem budget is ~2M
            # short at the ViT-B decoder shape. The 12-head finetune
            # geometry measures 98.9M of scoped stack (Mosaic does not
            # fully reuse buffers across the unrolled head loop) —
            # budget by head count.
            compiler_params=pltpu.CompilerParams(
                # the >8-head small-block tier is for LONG-kv geometries
                # (12-head 1568-token at bq=224 measures 62.0M); short-kv
                # callers (the 160-token encoder) keep the tight tier
                vmem_limit_bytes=_vmem_mb(
                    (100 if heads > 8 else 64) if bq > 512
                    else (
                        # 12-head N=4608 at bq=384 measures 102.41M
                        # (full q/do rows + f32 dq scratch scale with
                        # n_pad; the unrolled head loop's tiles with bq)
                        (110 if n_pad > 2048 else 80)
                        if heads > 8 and n_pad > 512 else 32
                    )
                ) * 1024 * 1024,
                # batch programs are independent; the kv-block dim is
                # sequential (dq accumulates across it in VMEM scratch)
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kp, vp, dop, ld, *bias8))

    dq, dk, dv = batch_dim0_call(call, qp, kp, vp, dop, ld, *bias_ops)
    return dq[:, :N], dk[:, :N], dv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mh_flash(q, k, v, scale, heads, interpret):
    out, _ = _mh_fwd_impl(q, k, v, scale, heads, interpret)
    return out


def _mh_flash_fwd(q, k, v, scale, heads, interpret):
    out, lse = _mh_fwd_impl(q, k, v, scale, heads, interpret)
    return out, (q, k, v, out, lse)


def _mh_flash_bwd(scale, heads, interpret, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _mh_bwd_impl(
        q, k, v, out, lse, do, scale, heads, interpret
    )
    return dq, dk, dv


_mh_flash.defvjp(_mh_flash_fwd, _mh_flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mh_flash_b(q, k, v, kv_bias, scale, heads, interpret):
    out, _ = _mh_fwd_impl(q, k, v, scale, heads, interpret, kv_bias=kv_bias)
    return out


def _mh_flash_b_fwd(q, k, v, kv_bias, scale, heads, interpret):
    out, lse = _mh_fwd_impl(
        q, k, v, scale, heads, interpret, kv_bias=kv_bias
    )
    return out, (q, k, v, kv_bias, out, lse)


def _mh_flash_b_bwd(scale, heads, interpret, res, do):
    q, k, v, kv_bias, out, lse = res
    dq, dk, dv = _mh_bwd_impl(
        q, k, v, out, lse, do, scale, heads, interpret, kv_bias=kv_bias
    )
    # the bias is a boolean-mask encoding (0 / -1e30) — non-differentiable
    # by construction; a zero cotangent keeps the vjp signature total
    return dq, dk, dv, jnp.zeros_like(kv_bias)


_mh_flash_b.defvjp(_mh_flash_b_fwd, _mh_flash_b_bwd)


def flash_attention_mh(
    q: Array, k: Array, v: Array, *, scale: float, num_heads: int,
    kv_bias: Array | None = None, interpret: bool | None = None,
) -> Array:
    """Fused multihead attention in token-major flat layout.

    q, k, v: (B, N, H*Dh) — the layout the fused qkv matmul produces and
    the output projection consumes, so the module needs no transposes.

    kv_bias: optional (B, N) f32 additive bias per kv position, shared
    across heads and queries (use 0 / -1e30 to mask kv columns exactly:
    their softmax weight underflows to 0 in forward AND backward). Every
    row must keep at least one unmasked column or its output is NaN —
    the BB-focused fusing guarantees this (ops default the kv set to the
    in-box tokens when the out-box set is empty).
    """
    if interpret is None:
        interpret = not _on_tpu()
    assert q.shape[-1] % num_heads == 0, (q.shape, num_heads)
    q, k, v, out_cast = _f16_boundary(q, k, v)
    if out_cast is not None:
        return flash_attention_mh(
            q, k, v, scale=scale, num_heads=num_heads, kv_bias=kv_bias,
            interpret=interpret,
        ).astype(out_cast)
    if kv_bias is not None:
        assert kv_bias.shape == (q.shape[0], k.shape[1]), (
            kv_bias.shape, q.shape, k.shape,
        )
        return _mh_flash_b(
            q, k, v, kv_bias.astype(jnp.float32), scale, num_heads,
            interpret,
        )
    return _mh_flash(q, k, v, scale, num_heads, interpret)


# ---------------------------------------------------------------------------
# Fused-qkv interface: the kernels read q/k/v directly out of the (B, N, 3A)
# tensor the qkv projection produces, via three BlockSpec views with
# different minor-dim block indices (A is a multiple of 128, so the minor
# tiling is legal). This deletes three XLA ops the (q, k, v) interface
# forced at the ViT-B geometry (measured in the step trace):
#   - fwd: the strided q/k/v slice copies (2.1 ms/step decoder alone);
#   - bwd: the f32 delta = sum(do*out) chain XLA scheduled as a full-size
#     f32 multiply + N-minor layout copy per block (~3.5 ms/step) — delta
#     is now a per-head lane reduction inside the kernel;
#   - bwd: the dq/dk/dv -> dqkv concat (the backward writes one fused
#     (B, N, 3A) cotangent; each program covers full rows since the
#     single-kv-block form fits VMEM at MOFO sequence lengths).
# ---------------------------------------------------------------------------


def _qkv_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dqkv_ref, *, scale, n_valid, heads, bq, base2=False):
    # grid (B,): one program per batch element, full rows; kv in one
    # block. q/k/v: (1, n_pad, A) views of the fused qkv; do, o:
    # (1, n_pad, A); lse: (1, nq, H, 8, bq) — the forward's layout,
    # consumed directly. dqkv: (1, n_pad, 3A): [0,A) dq, [A,2A) dk,
    # [2A,3A) dv.
    A = k_ref.shape[-1]
    hd = A // heads
    n_pad = k_ref.shape[1]
    nq = n_pad // bq
    # base2: see _mh_dqkv_kernel — q carries scale*log2e (score + dk,
    # with dk rescaled once at the write), k carries the true scale (dq)
    s_scale = scale * _LOG2E if base2 else scale
    exp_fn = jnp.exp2 if base2 else jnp.exp
    dk_fix = jnp.float32(1.0 / _LOG2E) if base2 else None
    ds16 = base2  # bf16 dS product: measured -0.85 ms/step at B=80
    kh_all = [k_ref[0][:, h * hd:(h + 1) * hd] for h in range(heads)]
    khs_all = [kh * kh.dtype.type(scale) for kh in kh_all]
    vh_all = [v_ref[0][:, h * hd:(h + 1) * hd] for h in range(heads)]
    dk_acc = [jnp.zeros((n_pad, hd), jnp.float32) for _ in range(heads)]
    dv_acc = [jnp.zeros((n_pad, hd), jnp.float32) for _ in range(heads)]

    def score(qh, h):
        s = jax.lax.dot_general(
            qh, kh_all[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, n_pad)
        if n_valid is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        return s

    for qi in range(nq):
        qb = q_ref[0, pl.ds(qi * bq, bq), :]
        dob = do_ref[0, pl.ds(qi * bq, bq), :]
        ob = o_ref[0, pl.ds(qi * bq, bq), :]
        qh_all = [
            qb[:, h * hd:(h + 1) * hd] * qb.dtype.type(s_scale)
            for h in range(heads)
        ]
        doh_all = [dob[:, h * hd:(h + 1) * hd] for h in range(heads)]
        dq_pieces = []

        def dp_mm(h):
            return jax.lax.dot_general(
                doh_all[h], vh_all[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # lookahead-1 software pipelining over heads, as in
        # _mh_dqkv_kernel, on BOTH independent matmuls (score and dp):
        # the MXU runs head h+1's score+dp while the VPU does head h's
        # exp / ds work
        s_next = score(qh_all[0], 0)
        dp_next = dp_mm(0)
        for h in range(heads):
            s = s_next
            dp = dp_next
            if h + 1 < heads:
                s_next = score(qh_all[h + 1], h + 1)
                dp_next = dp_mm(h + 1)
            doh = doh_all[h]
            # in-kernel delta: one per-head (bq, hd) f32 product + lane
            # reduction replaces the XLA-side full-size f32 multiply +
            # layout copy per block. bf16 products with f32 accumulation
            # match the precision of every other matmul in this kernel.
            oh = ob[:, h * hd:(h + 1) * hd]
            delta = jnp.sum(
                doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=1
            )  # (bq,)
            # padded q rows carry +inf lse (masked in _qkv_bwd_impl on
            # the small lse tensor), so their p — and every contribution
            # they make — is exactly zero
            lse = lse_ref[0, qi, h, 0]
            p = exp_fn(s - lse[:, None])  # padded q rows -> exactly 0
            p16 = p.astype(doh.dtype)
            dv_acc[h] = dv_acc[h] + jax.lax.dot_general(
                p16, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ds16:  # f32 cancellation-sensitive subtract, bf16 product
                ds = p16 * (dp - delta[:, None]).astype(p16.dtype)
            else:
                ds = (p * (dp - delta[:, None])).astype(qb.dtype)
            dk_acc[h] = dk_acc[h] + jax.lax.dot_general(
                ds, qh_all[h], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_pieces.append(jax.lax.dot_general(
                ds, khs_all[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dq_blk = jnp.concatenate(dq_pieces, axis=-1)  # (bq, A) f32
        dqkv_ref[0, pl.ds(qi * bq, bq), pl.ds(0, A)] = dq_blk.astype(
            dqkv_ref.dtype
        )
    for h in range(heads):
        dk_h = dk_acc[h] if dk_fix is None else dk_acc[h] * dk_fix
        dqkv_ref[0, :, pl.ds(A + h * hd, hd)] = dk_h.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[0, :, pl.ds(2 * A + h * hd, hd)] = dv_acc[h].astype(
            dqkv_ref.dtype
        )


def _qkv_bwd_kernel_houter(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                           dqkv_ref, *, scale, n_valid, heads, bq,
                           base2=False):
    # Head-OUTER variant of _qkv_bwd_kernel for many-head geometries
    # (the 12-head 1568-token classifier): the h-inner form keeps all
    # heads' k/v slices and dk/dv accumulators live across the whole
    # unrolled loop, which Mosaic does not buffer-share — 162.5M of
    # stack at 12 heads vs the 128M chip VMEM. Looping heads outermost
    # keeps one head's working set live (~40M at 12 heads); dq pieces
    # are written straight into the fused output at per-head lane
    # offsets, so nothing accumulates across heads. Software pipelining
    # runs lookahead-1 over the flattened (head, q-block) sequence.
    A = k_ref.shape[-1]
    hd = A // heads
    n_pad = k_ref.shape[1]
    nq = n_pad // bq
    # base2: see _mh_dqkv_kernel — q carries scale*log2e (score + dk,
    # with dk rescaled once at the write), k carries the true scale (dq)
    s_scale = scale * _LOG2E if base2 else scale
    exp_fn = jnp.exp2 if base2 else jnp.exp
    dk_fix = jnp.float32(1.0 / _LOG2E) if base2 else None
    ds16 = base2  # bf16 dS product: measured -0.85 ms/step at B=80
    qb_all = [q_ref[0, pl.ds(qi * bq, bq), :] for qi in range(nq)]
    dob_all = [do_ref[0, pl.ds(qi * bq, bq), :] for qi in range(nq)]
    ob_all = [o_ref[0, pl.ds(qi * bq, bq), :] for qi in range(nq)]

    def sl(h):
        return slice(h * hd, (h + 1) * hd)

    def qh_of(h, qi):
        qb = qb_all[qi]
        return qb[:, sl(h)] * qb.dtype.type(s_scale)

    def s_mm(h, qi):
        s = jax.lax.dot_general(
            qh_of(h, qi), k_ref[0][:, sl(h)], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, n_pad)
        if n_valid is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        return s

    def dp_mm(h, qi):
        return jax.lax.dot_general(
            dob_all[qi][:, sl(h)], v_ref[0][:, sl(h)],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    steps = [(h, qi) for h in range(heads) for qi in range(nq)]
    s_next = s_mm(*steps[0])
    dp_next = dp_mm(*steps[0])
    dk_acc = dv_acc = None
    for idx, (h, qi) in enumerate(steps):
        s, dp = s_next, dp_next
        if idx + 1 < len(steps):
            s_next = s_mm(*steps[idx + 1])
            dp_next = dp_mm(*steps[idx + 1])
        if qi == 0:
            dk_acc = jnp.zeros((n_pad, hd), jnp.float32)
            dv_acc = jnp.zeros((n_pad, hd), jnp.float32)
        doh = dob_all[qi][:, sl(h)]
        oh = ob_all[qi][:, sl(h)]
        delta = jnp.sum(
            doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=1
        )  # (bq,)
        lse = lse_ref[0, qi, h, 0]  # +inf on padded q rows
        p = exp_fn(s - lse[:, None])
        p16 = p.astype(doh.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p16, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ds16:  # f32 cancellation-sensitive subtract, bf16 product
            ds = p16 * (dp - delta[:, None]).astype(p16.dtype)
        else:
            ds = (p * (dp - delta[:, None])).astype(doh.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qh_of(h, qi), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        khs = k_ref[0][:, sl(h)]
        khs = khs * khs.dtype.type(scale)
        dq_piece = jax.lax.dot_general(
            ds, khs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, pl.ds(qi * bq, bq), pl.ds(h * hd, hd)] = \
            dq_piece.astype(dqkv_ref.dtype)
        if qi == nq - 1:
            dk_out = dk_acc if dk_fix is None else dk_acc * dk_fix
            dqkv_ref[0, :, pl.ds(A + h * hd, hd)] = dk_out.astype(
                dqkv_ref.dtype
            )
            dqkv_ref[0, :, pl.ds(2 * A + h * hd, hd)] = dv_acc.astype(
                dqkv_ref.dtype
            )


def _qkv_fwd_impl(qkv, scale, heads, interpret):
    """qkv: (B, N, 3A). Returns (out, lse (B, nq, H, 8, bq))."""
    B, N, A3 = qkv.shape
    A = A3 // 3
    bq = _block_for(N, heads)
    n_pad = -(-N // bq) * bq
    n_valid = N if n_pad != N else None
    qkvp = _pad_to(qkv, n_pad, 1)
    nq = n_pad // bq
    base2 = qkv.dtype == jnp.bfloat16

    def call(qkvp):
        b = qkvp.shape[0]  # LOCAL batch under SPMD partitioning
        out, lse = pl.pallas_call(
            functools.partial(
                _mh_fwd_kernel, scale=scale, n_valid=n_valid, heads=heads,
                base2=base2,
            ),
            grid=(b, nq),
            in_specs=[
                # three views of the one fused tensor: the minor dim is
                # blocked in units of A, index 0/1/2 selects q/k/v
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b, i: (b, 0, 2),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, A), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, heads, 8, bq),
                             lambda b, i: (b, i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n_pad, A), qkvp.dtype),
                jax.ShapeDtypeStruct((b, nq, heads, 8, bq), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_mb(
                    # long-kv geometries (32-frame / 3136-token
                    # variants) keep full k/v rows + two live
                    # (bq, Nk) f32 score tiles even at small
                    # divisor blocks: 6-head N=3136 at bq=448
                    # measures 29.2M vs the 24M short-kv tier
                    80 if (bq > 512 or n_pad > 2048)
                    # >8-head long-kv fwd: the unrolled head
                    # loop's live score tiles aren't buffer-
                    # shared (ViT-L classifier 16h/N=1568/bq=224
                    # measures 32.0M vs the 24M short-kv tier)
                    else (40 if heads > 8 and n_pad > 512 else 24)
                ) * 1024 * 1024,
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qkvp, qkvp, qkvp)
        return out, lse

    out, lse = batch_dim0_call(call, qkvp)
    return out[:, :N], lse


def _qkv_bwd_impl(qkv, out, lse, do, scale, heads, interpret):
    B, N, A3 = qkv.shape
    A = A3 // 3
    bq = _block_for(N, heads)
    n_pad = -(-N // bq) * bq
    if (
        n_pad > 2048
        or (qkv.dtype != jnp.bfloat16 and not interpret)
    ):
        # Blocked fallback for (a) long sequences (32-frame / 384px
        # variants) and (b) f32 callers (the bit-parity --dtype float32
        # path; f32 doubles the transients, 124.3M of Mosaic stack at 6
        # heads vs the 128M chip VMEM). Runs the blocked kernels on
        # slices and concatenates.
        q = qkv[:, :, :A]
        k = qkv[:, :, A:2 * A]
        v = qkv[:, :, 2 * A:]
        dq, dk, dv = _mh_bwd_impl(
            q, k, v, out, lse, do, scale, heads, interpret
        )
        return jnp.concatenate([dq, dk, dv], axis=-1)
    n_valid = N if n_pad != N else None
    qkvp = _pad_to(qkv, n_pad, 1)
    outp = _pad_to(out, n_pad, 1)
    dop = _pad_to(do, n_pad, 1)
    if n_valid is not None:
        # +inf lse on padded q rows zeroes their contribution in-kernel
        # (a tiny (B, nq, H, 8, bq) tensor — negligible XLA-side work)
        nq = n_pad // bq
        row = (jnp.arange(n_pad).reshape(nq, 1, 1, bq))[None]
        lse = jnp.where(row < N, lse, jnp.inf)

    # h-inner keeps every head's k/v slice + dk/dv accumulator live over
    # the whole unrolled loop (measured 88.1M Mosaic stack at 6 heads x
    # 64 = A 384, 162.5M at 12 heads, 114.5M at the ViT-L decoder's
    # 8 heads x 64 = A 512 — the last two over what fits); the h-outer
    # variant keeps one head's working set live and covers many-head and
    # wide-decoder geometries.
    kernel = (
        _qkv_bwd_kernel if heads <= 8 and A <= 384
        else _qkv_bwd_kernel_houter
    )

    base2 = qkv.dtype == jnp.bfloat16

    def call(qkvp, outp, dop, lse):
        b = qkvp.shape[0]  # LOCAL batch under SPMD partitioning
        return pl.pallas_call(
            functools.partial(
                kernel, scale=scale, n_valid=n_valid,
                heads=heads, bq=bq, base2=base2,
            ),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n_pad, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b: (b, 0, 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b: (b, 0, 2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lse.shape[1], heads, 8, bq),
                             lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_pad, A3), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, A3), qkvp.dtype),
            compiler_params=pltpu.CompilerParams(
                # measured Mosaic stack: h-inner 88.1M at the 6-head
                # 1568-token decoder; h-outer at the 12-head classifier
                # needs 62.0M even at 224-row blocks (the dqkv output
                # block alone is bq x 3A), and the 16-head/A=1024 ViT-L
                # classifier 80.76M — budget by head count AND width
                # for long-kv geometries; short-kv (160-token encoder)
                # keeps the tight tier
                vmem_limit_bytes=_vmem_mb(
                    100 if bq > 512
                    else (
                        # >2048-token kv rows + per-head score tiles
                        # (N=4608 at bq=384) need the fat tier
                        (100 if n_pad > 2048 else
                         (88 if A > 768 else 80))
                        if heads > 8 and n_pad > 512 else 40
                    )
                ) * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(qkvp, qkvp, qkvp, dop, outp, lse)

    dqkv = batch_dim0_call(call, qkvp, outp, dop, lse)
    return dqkv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _qkv_flash(qkv, scale, heads, interpret):
    out, _ = _qkv_fwd_impl(qkv, scale, heads, interpret)
    return out


def _qkv_flash_fwd(qkv, scale, heads, interpret):
    out, lse = _qkv_fwd_impl(qkv, scale, heads, interpret)
    return out, (qkv, out, lse)


def _qkv_flash_bwd(scale, heads, interpret, res, do):
    qkv, out, lse = res
    return (_qkv_bwd_impl(qkv, out, lse, do, scale, heads, interpret),)


_qkv_flash.defvjp(_qkv_flash_fwd, _qkv_flash_bwd)


def flash_attention_qkv(
    qkv: Array, *, scale: float, num_heads: int,
    interpret: bool | None = None,
) -> Array:
    """Fused multihead attention straight from the fused qkv projection.

    qkv: (B, N, 3*H*Dh) — [0,A) q, [A,2A) k, [2A,3A) v, exactly what the
    fused qkv matmul produces. Returns (B, N, H*Dh), projection-ready.
    Numerics are identical to flash_attention_mh on the slices; the
    fused interface exists to delete the XLA-side slice/delta/concat
    passes around the kernels (see the section comment above).
    """
    if interpret is None:
        interpret = not _on_tpu()
    assert qkv.shape[-1] % (3 * num_heads) == 0, (qkv.shape, num_heads)
    if qkv.dtype == jnp.float16:  # see _f16_boundary
        return flash_attention_qkv(
            qkv.astype(jnp.bfloat16), scale=scale, num_heads=num_heads,
            interpret=interpret,
        ).astype(jnp.float16)
    return _qkv_flash(qkv, scale, num_heads, interpret)
