"""Transformer primitives for the MOFO / VideoMAE model family.

Behavioral parity targets (reference: /root/reference/modeling_finetune.py):
  - Mlp: fc1 -> exact GELU -> fc2 -> dropout (dropout only after fc2,
    "BERT-style"; reference lines 34-51).
  - Attention: fused qkv projection with learned q/v biases and the k bias
    pinned to zero (reference lines 54-98).
  - Block: pre-LN residual blocks with optional layerscale gamma_1/gamma_2
    when init_values > 0 (reference lines 194-223).
  - PatchEmbed: Conv3d(kernel=stride=(tubelet,16,16)) cube embedding
    (reference lines 226-248). Here it is a reshape + one MXU matmul -- the
    TPU-native formulation of a stride-equal conv. Patch-vector ordering is
    (p0, p1, p2, c) with channel fastest, matching the reconstruction-target
    layout in engine_for_pretraining.py:50-58 so decoder-head weights are
    interchangeable.
  - get_sinusoid_encoding_table: frozen sin/cos table
    (reference lines 252-262).

Layout convention: activations are channel-last video clips (B, T, H, W, C)
— TPU-friendly — versus the reference's (B, C, T, H, W).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.ops.attention import dot_product_attention

Array = jax.Array
Dtype = Any

# Matches timm.models.layers.trunc_normal_(std=.02): truncation at +/-2
# absolute == +/-100 sigma... timm default is a=-2, b=2 (absolute bounds);
# with std=.02 that is +/-100 sigma, i.e. effectively untruncated normal.
# jax truncated_normal truncates at +/-2 sigma; for std=.02 the difference
# is statistically negligible at init. We use stddev=.02 truncated at 2
# sigma and document the discrepancy here.
trunc_normal_init = functools.partial(nn.initializers.truncated_normal, 0.02)


@functools.lru_cache(maxsize=16)
def _sinusoid_table_np(n_position: int, d_hid: int) -> np.ndarray:
    """Sin/cos positional table, numerically identical to the reference
    get_sinusoid_encoding_table (modeling_finetune.py:252-262)."""
    position = np.arange(n_position, dtype=np.float64)[:, None]
    hid_j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = position / np.power(10000.0, 2.0 * (np.floor(hid_j / 2.0)) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def get_sinusoid_encoding_table(n_position: int, d_hid: int) -> Array:
    """Frozen (1, n_position, d_hid) sin-cos positional embedding."""
    return jnp.asarray(_sinusoid_table_np(n_position, d_hid))[None]


def drop_path(
    x: Array, rate: float, deterministic: bool, rng: Optional[Array]
) -> Array:
    """Stochastic depth per sample (reference modeling_finetune.py:20-31)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        rng = None
        if not deterministic and self.rate > 0.0:
            rng = self.make_rng("droppath")
        return drop_path(x, self.rate, deterministic, rng)


class Mlp(nn.Module):
    """fc1 -> GELU(exact) -> fc2 -> dropout. Reference modeling_finetune.py:34-51."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = True,
    ) -> Array:
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc1",
        )(x)
        # torch nn.GELU default is the exact erf formulation, which XLA
        # lowers as a ~40-op branchy f32 erfc polynomial. In bf16 steps
        # the tanh form computed in f32 is used instead: measured -10.4
        # ms on the full ViT-B MOFO step (122.5 -> 112.0, the single
        # biggest r4 win; docs/ab_r4.jsonl gelu_tanh) with max deviation
        # from exact GELU 4.7e-4 absolute — a last-bit bf16 flip on a
        # minority of elements, and a 50-step convergence A/B tracks the
        # erf+f32 reference (docs/PERF.md). f32 callers (the bit-parity
        # path vs the torch reference) always use exact erf.
        if self.dtype == jnp.bfloat16:
            x = nn.gelu(
                x.astype(jnp.float32), approximate=True
            ).astype(self.dtype)
        else:
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(x)
        x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv and zero-pinned k bias.

    Reference modeling_finetune.py:54-98. The k bias is structurally zero
    (torch builds qkv_bias = cat(q_bias, zeros, v_bias) every forward); here
    we keep the same parameter structure (q_bias, v_bias learned) so torch
    checkpoints map 1:1.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()
    attn_impl: str = "auto"  # auto | xla | pallas
    sow_attn: bool = False  # sow softmax probs (attention-rollout vis)

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = True,
        attn_bias: Optional[Array] = None,
    ) -> Array:
        B, N, _ = x.shape
        head_dim = self.attn_head_dim or self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv_kernel = self.param(
            "qkv_kernel", self.kernel_init, (self.dim, 3 * all_head_dim),
            jnp.float32,
        )
        q_bias = v_bias = None
        if self.qkv_bias:
            q_bias = self.param(
                "q_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32
            )
            v_bias = self.param(
                "v_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32
            )

        # Fused-path eligibility: the flat token-major layout feeds the
        # Pallas multihead kernel with ZERO transposes — one flat MXU
        # matmul for qkv and a flat matmul for the projection. The
        # head-major path stays for short sequences (XLA attention),
        # attention bias, active attention dropout, and prob sowing.
        from mofo_tpu.ops.attention import _PALLAS_MIN_SEQ, _on_tpu

        fusable = (
            attn_bias is None
            and (deterministic or self.attn_drop == 0.0)
            and not self.sow_attn
        )
        # The flat kernel's BlockSpec q/k/v views of the fused (B, N, 3A)
        # tensor need A to be a lane-tile (128) multiple for legal Mosaic
        # minor-dim tiling; misaligned geometries (attn_head_dim overrides,
        # odd head counts like 3x64) take the head-major kernel instead.
        # (f16 callers are upcast to bf16 at the kernel boundary —
        # flash_attention._f16_boundary.)
        flat_aligned = all_head_dim % 128 == 0
        if self.attn_impl == "pallas":
            # dispatcher raises on bias/dropout for explicit pallas;
            # keep that behavior for the flat path too
            if attn_bias is not None:
                raise ValueError(
                    "attn_impl='pallas' does not support an attention bias"
                )
            if self.attn_drop > 0.0 and not deterministic:
                raise ValueError(
                    "attn_impl='pallas' does not support attention dropout"
                )
            use_flat = not self.sow_attn and flat_aligned
        elif self.attn_impl == "auto":
            use_flat = (
                fusable and _on_tpu() and N >= _PALLAS_MIN_SEQ
                and flat_aligned
            )
        else:
            use_flat = False

        # qkv projection, shared by both layouts: one flat matmul into
        # the fused [q | k | v] layout, heads contiguous
        bias_flat = None
        if self.qkv_bias:
            bias_flat = jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]
            ).astype(self.dtype)
        qkv = jnp.einsum(
            "bnd,de->bne", x, qkv_kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if bias_flat is not None:
            qkv = qkv + bias_flat

        if use_flat:
            from mofo_tpu.ops.flash_attention import flash_attention_qkv

            # the kernel reads q/k/v straight out of the fused qkv via
            # BlockSpec views — no slice copies fwd, no concat bwd
            out = flash_attention_qkv(
                qkv, scale=scale, num_heads=self.num_heads
            )  # (B, N, H*Dh) — already projection-ready
        else:
            # head-major path: the flat qkv above then reshape+transpose
            # to (3, B, H, N, Dh) — ~2x the strided "bnd,dthe->tbhne"
            # einsum for fwd+bwd including dW (the transpose is cheap;
            # the strided contraction is not)
            qkv = qkv.reshape(
                B, N, 3, self.num_heads, head_dim
            ).transpose(2, 0, 3, 1, 4)

            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, Dh)

            if self.sow_attn:
                logits = jnp.einsum(
                    "bhqd,bhkd->bhqk", q * scale, k,
                    preferred_element_type=jnp.float32,
                )
                self.sow(
                    "intermediates", "attn_probs",
                    jax.nn.softmax(logits, axis=-1),
                )

            dropout_rng = None
            if not deterministic and self.attn_drop > 0.0:
                dropout_rng = self.make_rng("dropout")
            out = dot_product_attention(
                q,
                k,
                v,
                scale=scale,
                bias=attn_bias,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                # explicit pallas lands here for sow_attn (needs
                # materialized probs -> xla) or a misaligned flat layout
                # (honor the request via the head-major flash kernel)
                impl=(
                    ("xla" if self.sow_attn else "pallas")
                    if self.attn_impl == "pallas" else self.attn_impl
                ),
            )  # (B, H, N, Dh)
            # explicit transpose + flat matmul beats the strided-h einsum
            # "bhne,hed->bnd" (the h contraction dim is not contiguous in
            # head-major layout)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, all_head_dim)

        pk = self.param(
            "proj_kernel", self.kernel_init, (all_head_dim, self.dim),
            jnp.float32,
        )
        pb = self.param(
            "proj_bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        out = jnp.einsum(
            "bnh,hd->bnd", out, pk.astype(self.dtype),
            preferred_element_type=self.dtype,
        ) + pb.astype(self.dtype)
        out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Cross-attention: queries from x, keys/values from y.

    Reference modeling_finetune.py:100-160 (used by the MCA fusing block in
    the BB-focused classifier). Bias structure: q has learned q_bias; kv bias
    is cat(zeros, v_bias). The reference runs it per sample on ragged token
    sets; here it is batched with an additive attention bias masking invalid
    kv positions.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init()
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: Array,
        y: Array,
        deterministic: bool = True,
        kv_mask: Optional[Array] = None,
    ) -> Array:
        B, Nx, _ = x.shape
        Ny = y.shape[1]
        head_dim = self.attn_head_dim or self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        q_kernel = self.param(
            "q_kernel", self.kernel_init, (self.dim, all_head_dim), jnp.float32
        )
        kv_kernel = self.param(
            "kv_kernel", self.kernel_init, (self.dim, 2 * all_head_dim),
            jnp.float32,
        )
        q = jnp.einsum("bnd,de->bne", x, q_kernel.astype(self.dtype))
        kv = jnp.einsum("bnd,de->bne", y, kv_kernel.astype(self.dtype))
        if self.qkv_bias:
            q_bias = self.param(
                "q_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32
            )
            v_bias = self.param(
                "v_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32
            )
            q = q + q_bias.astype(self.dtype)
            kv = kv + jnp.concatenate(
                [jnp.zeros_like(v_bias), v_bias]
            ).astype(self.dtype)

        # Flat fused path: the multihead flash kernel takes the (B, N, A)
        # layout the projections produce (zero transposes) and masks kv
        # columns in-kernel via an additive bias row — this is what keeps
        # the 1568-token MCA cross-attention of the BB-focused classifier
        # off the naive N^2 XLA path (whose f32 logits+probs round-trip
        # ~0.7 GB/step through HBM at the bench geometry).
        from mofo_tpu.ops.attention import _PALLAS_MIN_SEQ, _on_tpu

        drop_active = not deterministic and self.attn_drop > 0.0
        use_flat = (
            self.attn_impl in ("auto", "pallas")
            and not drop_active
            and Nx == Ny
            and (
                self.attn_impl == "pallas"
                or (_on_tpu() and Ny >= _PALLAS_MIN_SEQ)
            )
        )
        if use_flat:
            from mofo_tpu.ops.flash_attention import flash_attention_mh

            kv_bias = None
            if kv_mask is not None:
                # 0 / -1e30 per kv position; every sample keeps >=1 valid
                # column (the BB fusing falls back to the in-box set when
                # out-box is empty), so no row is fully masked
                kv_bias = jnp.where(kv_mask, 0.0, -1e30).astype(
                    jnp.float32
                )
            out = flash_attention_mh(
                q,
                kv[:, :, :all_head_dim],
                kv[:, :, all_head_dim:],
                scale=scale,
                num_heads=self.num_heads,
                kv_bias=kv_bias,
            )  # (B, Nx, A) — projection-ready
        else:
            qh = q.reshape(
                B, Nx, self.num_heads, head_dim
            ).transpose(0, 2, 1, 3)
            kvh = kv.reshape(B, Ny, 2, self.num_heads, head_dim)
            k = kvh[:, :, 0].transpose(0, 2, 1, 3)
            v = kvh[:, :, 1].transpose(0, 2, 1, 3)

            attn_bias = None
            if kv_mask is not None:
                # (B, Ny) boolean -> additive bias (B, 1, 1, Ny)
                attn_bias = jnp.where(
                    kv_mask[:, None, None, :], 0.0, -jnp.inf
                ).astype(jnp.float32)

            dropout_rng = None
            if drop_active:
                dropout_rng = self.make_rng("dropout")
            out = dot_product_attention(
                qh,
                k,
                v,
                scale=scale,
                bias=attn_bias,
                dropout_rate=self.attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                impl="xla",
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, Nx, all_head_dim)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(out)
        out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-LN transformer block with optional layerscale.

    Reference modeling_finetune.py:194-223.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()
    attn_impl: str = "auto"
    sow_attn: bool = False
    # (A fused Pallas LN+matmul variant of norm1/norm2 was built and
    # measured OFF: each pallas_call is an XLA fusion boundary, and
    # unfused LN folds into neighboring elementwise work — qkv site
    # 151.9 -> 157.3 ms, fc1 -> 173.3 ms on the full step. Deleted;
    # history in docs/PERF.md.)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        in_dtype = x.dtype
        attn_in = _layer_norm(x, self.dtype, name="norm1")
        attn_out = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            attn_impl=self.attn_impl,
            sow_attn=self.sow_attn,
            name="attn",
        )(
            attn_in,
            deterministic=deterministic,
        )
        if self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.init_values),
                (self.dim,),
                jnp.float32,
            )
            attn_out = attn_out * gamma_1.astype(attn_out.dtype)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            attn_out, deterministic=deterministic
        )

        mlp_in = _layer_norm(x, self.dtype, name="norm2")
        mlp_out = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="mlp",
        )(
            mlp_in,
            deterministic=deterministic,
        )
        if self.init_values > 0:
            gamma_2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.init_values),
                (self.dim,),
                jnp.float32,
            )
            mlp_out = mlp_out * gamma_2.astype(mlp_out.dtype)
        x = x + DropPath(self.drop_path_rate, name="drop_path2")(
            mlp_out, deterministic=deterministic
        )
        return x.astype(in_dtype)


class MCABlock(nn.Module):
    """Cross-attention block ("MCA") used by the BB-focused classifier.

    Reference modeling_finetune.py:162-191: pre-LN cross-attention (norm1
    applied to BOTH x and y, matching `self.attn(self.norm1(x), self.norm1(y))`)
    followed by an MLP, both residual.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init()
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: Array,
        y: Array,
        deterministic: bool = True,
        kv_mask: Optional[Array] = None,
    ) -> Array:
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")
        attn_out = CrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            attn_impl=self.attn_impl,
            name="attn",
        )(
            norm1(x).astype(self.dtype),
            norm1(y).astype(self.dtype),
            deterministic=deterministic,
            kv_mask=kv_mask,
        )
        if self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.init_values),
                (self.dim,),
                jnp.float32,
            )
            attn_out = attn_out * gamma_1.astype(attn_out.dtype)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            attn_out, deterministic=deterministic
        )

        mlp_out = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="mlp",
        )(
            _layer_norm(x, self.dtype, name="norm2"),
            deterministic=deterministic,
        )
        if self.init_values > 0:
            gamma_2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.init_values),
                (self.dim,),
                jnp.float32,
            )
            mlp_out = mlp_out * gamma_2.astype(mlp_out.dtype)
        x = x + DropPath(self.drop_path_rate, name="drop_path2")(
            mlp_out, deterministic=deterministic
        )
        return x


def _layer_norm(x: Array, dtype: Dtype, name: str) -> Array:
    """LayerNorm(eps=1e-6) computed in float32, output cast to compute
    dtype. (MXU-statistics variants that computed the reduces as matmuls
    measured SLOWER on the full step — mm 126.1 ms, mmvjp 123.4 vs 122.5
    plain, docs/ab_r4.jsonl — and were deleted; XLA's fused LN wins.)"""
    y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)(x)
    return y.astype(dtype)


class PatchEmbed(nn.Module):
    """Cube (tubelet) embedding as reshape + matmul.

    Equivalent to the reference Conv3d(3 -> D, kernel=stride=(tubelet,16,16))
    (modeling_finetune.py:226-248) but expressed as one large matmul so XLA
    tiles it directly onto the MXU. Input (B, T, H, W, C) channel-last;
    output (B, N, D) with token order (t, h, w) — same as the reference's
    flatten(2).transpose(1, 2).

    The flattened patch-vector order is (p0, p1, p2, c), channel fastest.
    """

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    num_frames: int = 16
    tubelet_size: int = 2
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @property
    def num_patches(self) -> int:
        return (
            (self.img_size // self.patch_size) ** 2
            * (self.num_frames // self.tubelet_size)
        )

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p0, p = self.tubelet_size, self.patch_size
        patch_dim = p0 * p * p * self.in_chans
        if x.ndim == 3:
            # pre-patchified (B, N, patch_dim) rows (ops.patchify.
            # patchify_flat) — lets the train step share ONE layout
            # transpose between embedding and reconstruction targets
            assert x.shape[-1] == patch_dim, (x.shape, patch_dim)
        else:
            assert x.shape[2] == self.img_size, (
                f"Input image size ({x.shape[2]}x{x.shape[3]}) doesn't "
                f"match model ({self.img_size}x{self.img_size})."
            )
        kernel = self.param(
            "kernel", self.kernel_init, (patch_dim, self.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        if x.ndim == 5:
            # (Letting the TPU conv emitter or a multi-contracting-dim
            # dot_general do the patch extraction measured 171.5 / 168.4
            # ms full step vs 129.7 for this explicit reshape+matmul —
            # deleted; history in docs/PERF.md.)
            B, T, H, W, C = x.shape
            t, h, w = T // p0, H // p, W // p
            x = x.reshape(B, t, p0, h, p, w, p, C)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            x = x.reshape(B, t * h * w, patch_dim)
        x = (
            jnp.einsum(
                "bnp,pd->bnd",
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=self.dtype,
            )
            + bias.astype(self.dtype)
        )
        return x


class SoftAttention(nn.Module):
    """Soft attention pooling used by the BB-focused classifier's
    'soft_attn' fusing mode (reference modeling_finetune.py:264-303).

    NOTE (behavioral record): with step_dim=1 as instantiated
    (modeling_finetune.py:480-481), the reference math reduces to
    mean(a) * sum(x) where a is normalized over tokens, i.e. very nearly
    the plain token mean (up to the 1e-10 normalizer epsilon). We implement
    the literal masked computation so numerics, gradients, and parameters
    match; callers pass a boolean token mask instead of ragged gathers.
    """

    feature_dim: int
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, token_mask: Array) -> Array:
        # x: (B, N, D); token_mask: (B, N) bool selecting the ragged subset.
        # torch kaiming_uniform_ with defaults (a=0, fan_in = size(1) = 1)
        # gives U(-sqrt(6), sqrt(6)).
        def _kaiming_uniform_fan1(key, shape, dtype=jnp.float32):
            bound = np.sqrt(6.0)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param(
            "weight", _kaiming_uniform_fan1, (self.feature_dim, 1), jnp.float32
        )
        b = (
            self.param("b", nn.initializers.zeros, (1,), jnp.float32)
            if self.bias
            else 0.0
        )
        eij = jnp.einsum("bnd,dk->bnk", x.astype(jnp.float32), w)[..., 0] + b
        a = jnp.exp(jnp.tanh(eij)) * token_mask.astype(jnp.float32)
        denom = jnp.sum(a, axis=1, keepdims=True) + 1e-10
        a = a / denom
        count = jnp.maximum(jnp.sum(token_mask, axis=1), 1).astype(jnp.float32)
        # Literal reference result: mean_i(a_i) * sum_j(x_j) over the subset.
        mean_a = jnp.sum(a, axis=1) / count  # (B,)
        sum_x = jnp.sum(
            x * token_mask[..., None].astype(x.dtype), axis=1
        )  # (B, D)
        return (mean_a[:, None] * sum_x.astype(jnp.float32)).astype(x.dtype)
