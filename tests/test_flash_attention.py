"""Flash attention kernel vs the XLA reference path: forward and gradient
parity (interpreter mode on CPU), including non-multiple-of-block lengths
(the 1568-token decoder case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mofo_tpu.ops.attention import xla_attention
from mofo_tpu.ops.flash_attention import flash_attention


def _qkv(B=2, N=160, H=2, D=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("N", [128, 160, 1568])
def test_forward_matches_xla(N):
    q, k, v = _qkv(N=N)
    scale = 64**-0.5
    ours = flash_attention(q, k, v, scale=scale, interpret=True)
    ref = xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_gradients_match_xla():
    q, k, v = _qkv(N=200, B=1, H=2)
    scale = 64**-0.5

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale=scale, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        out = xla_attention(q, k, v, scale=scale)
        return jnp.sum(jnp.sin(out))

    g_ours = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close():
    q, k, v = _qkv(N=256)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
    scale = 64**-0.5
    ours = flash_attention(q16, k16, v16, scale=scale, interpret=True)
    ref = xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(
        np.asarray(ours, dtype=np.float32), np.asarray(ref),
        atol=3e-2, rtol=3e-2,
    )


# ---------------------------------------------------------------------------
# Multihead flat-layout kernels (flash_attention_mh)
# ---------------------------------------------------------------------------

from mofo_tpu.ops.flash_attention import flash_attention_mh  # noqa: E402


def _flat_qkv(B=2, N=160, H=3, D=64, seed=1):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    return mk(), mk(), mk()


def _xla_flat(q, k, v, scale, heads):
    B, N, A = q.shape
    hd = A // heads
    to4 = lambda t: t.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    o = xla_attention(to4(q), to4(k), to4(v), scale=scale)
    return o.transpose(0, 2, 1, 3).reshape(B, N, A)


@pytest.mark.parametrize("N", [128, 160, 1568])
def test_mh_forward_matches_xla(N):
    q, k, v = _flat_qkv(N=N)
    scale = 64**-0.5
    ours = flash_attention_mh(
        q, k, v, scale=scale, num_heads=3, interpret=True
    )
    ref = _xla_flat(q, k, v, scale, 3)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_mh_gradients_match_xla():
    q, k, v = _flat_qkv(N=300, B=1, H=2)
    scale = 64**-0.5

    def loss_mh(q, k, v):
        out = flash_attention_mh(
            q, k, v, scale=scale, num_heads=2, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_flat(q, k, v, scale, 2)))

    g_ours = jax.grad(loss_mh, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


def test_mh_bf16_forward_close():
    q, k, v = _flat_qkv(N=256)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
    scale = 64**-0.5
    ours = flash_attention_mh(
        q16, k16, v16, scale=scale, num_heads=3, interpret=True
    )
    ref = _xla_flat(q, k, v, scale, 3)
    np.testing.assert_allclose(
        np.asarray(ours, dtype=np.float32), np.asarray(ref),
        atol=3e-2, rtol=3e-2,
    )


# ---------------------------------------------------------------------------
# kv-bias (masked cross-attention) path: the BB-focused classifier's MCA
# block masks out-of-box kv columns with an additive 0/-1e30 row.
# ---------------------------------------------------------------------------


def _kv_mask_bias(B, N, seed=7):
    rng = np.random.RandomState(seed)
    mask = rng.rand(B, N) > 0.5
    mask[:, 3] = True  # >=1 valid kv column per sample
    maskj = jnp.asarray(mask)
    return maskj, jnp.where(maskj, 0.0, -1e30).astype(jnp.float32)


def _xla_flat_masked(q, k, v, scale, heads, mask):
    B, N, A = q.shape
    hd = A // heads
    to4 = lambda t: t.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    bias = jnp.where(mask[:, None, None, :], 0.0, -jnp.inf)
    o = xla_attention(to4(q), to4(k), to4(v), scale=scale, bias=bias)
    return o.transpose(0, 2, 1, 3).reshape(B, N, A)


@pytest.mark.parametrize("N", [160, 300, 1568])
def test_mh_kv_bias_forward_matches_xla(N):
    q, k, v = _flat_qkv(N=N, B=1)
    mask, bias = _kv_mask_bias(1, N)
    scale = 64**-0.5
    ours = flash_attention_mh(
        q, k, v, scale=scale, num_heads=3, kv_bias=bias, interpret=True
    )
    ref = _xla_flat_masked(q, k, v, scale, 3, mask)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("N", [300, 1280])  # 1280 -> two 640 kv blocks
def test_mh_kv_bias_gradients_match_xla(N):
    q, k, v = _flat_qkv(N=N, B=1, H=2)
    mask, bias = _kv_mask_bias(1, N)
    scale = 64**-0.5

    def loss_mh(q, k, v):
        out = flash_attention_mh(
            q, k, v, scale=scale, num_heads=2, kv_bias=bias,
            interpret=True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_flat_masked(q, k, v, scale, 2, mask)))

    g_ours = jax.grad(loss_mh, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


def test_mh_kv_bias_bf16_grads_close():
    q, k, v = _flat_qkv(N=320, B=1)
    mask, bias = _kv_mask_bias(1, 320)
    scale = 64**-0.5
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(fn, *args):
        return jnp.sum(
            jnp.sin(fn(*args).astype(jnp.float32) / 8.0)
        )

    g_ours = jax.grad(
        lambda *a: loss(
            lambda q, k, v: flash_attention_mh(
                q, k, v, scale=scale, num_heads=3, kv_bias=bias,
                interpret=True,
            ),
            *a,
        ),
        argnums=(0, 1, 2),
    )(q16, k16, v16)
    g_ref = jax.grad(
        lambda *a: loss(
            lambda q, k, v: _xla_flat_masked(q, k, v, scale, 3, mask), *a
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b),
            atol=3e-2, rtol=3e-2, err_msg=f"d{name} mismatch",
        )


def test_cross_attention_pallas_matches_xla():
    """CrossAttention's flat fused path (explicit pallas, interpret off-TPU)
    must match its head-major XLA path — params shared, same kv mask."""
    from mofo_tpu.models.layers import CrossAttention

    B, N, dim, heads = 1, 160, 128, 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    y = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    mask, _ = _kv_mask_bias(B, N)

    mod_x = CrossAttention(dim=dim, num_heads=heads, qkv_bias=True,
                           attn_impl="xla")
    mod_p = CrossAttention(dim=dim, num_heads=heads, qkv_bias=True,
                           attn_impl="pallas")
    params = mod_x.init(jax.random.PRNGKey(0), x, y, kv_mask=mask)

    def run(mod, params):
        return mod.apply(params, x, y, kv_mask=mask)

    out_x = run(mod_x, params)
    out_p = run(mod_p, params)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=3e-5, rtol=3e-5
    )

    gx = jax.grad(lambda p: jnp.sum(jnp.sin(run(mod_x, p))))(params)
    gp = jax.grad(lambda p: jnp.sum(jnp.sin(run(mod_p, p))))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5
        ),
        gx, gp,
    )


# ---------------------------------------------------------------------------
# Fused-qkv interface (flash_attention_qkv)
# ---------------------------------------------------------------------------

from mofo_tpu.ops.flash_attention import flash_attention_qkv  # noqa: E402


@pytest.mark.parametrize("N", [128, 160, 300, 1568])
def test_qkv_forward_matches_xla(N):
    q, k, v = _flat_qkv(N=N)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    scale = 64**-0.5
    ours = flash_attention_qkv(
        qkv, scale=scale, num_heads=3, interpret=True
    )
    ref = _xla_flat(q, k, v, scale, 3)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("N", [160, 300])
def test_qkv_gradients_match_xla(N):
    # N=160 pads to one 256 block (padded-row/column masking on the
    # single-kv-block backward); N=300 pads to two blocks (qi loop)
    q, k, v = _flat_qkv(N=N, B=2, H=2)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    scale = 64**-0.5

    def loss_qkv(qkv):
        out = flash_attention_qkv(
            qkv, scale=scale, num_heads=2, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(qkv):
        A = qkv.shape[-1] // 3
        return jnp.sum(jnp.sin(_xla_flat(
            qkv[..., :A], qkv[..., A:2 * A], qkv[..., 2 * A:], scale, 2
        )))

    g_ours = jax.grad(loss_qkv)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=3e-5, rtol=3e-5
    )


def test_qkv_long_seq_fallback_grads():
    # n_pad > 2048 routes the backward through the blocked two-kernel
    # path + concat; check it end-to-end at a small-but-long geometry
    q, k, v = _flat_qkv(N=2100, B=1, H=1)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    scale = 64**-0.5

    def loss_qkv(qkv):
        out = flash_attention_qkv(
            qkv, scale=scale, num_heads=1, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(qkv):
        A = qkv.shape[-1] // 3
        return jnp.sum(jnp.sin(_xla_flat(
            qkv[..., :A], qkv[..., A:2 * A], qkv[..., 2 * A:], scale, 1
        )))

    g_ours = jax.grad(loss_qkv)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=3e-5, rtol=3e-5
    )


def test_qkv_houter_gradients_match_xla():
    # >8 heads routes the single-kv-block backward through the
    # head-outer kernel variant (VMEM-bounded for many-head geometries)
    q, k, v = _flat_qkv(N=300, B=2, H=9)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    scale = 64**-0.5

    def loss_qkv(qkv):
        out = flash_attention_qkv(
            qkv, scale=scale, num_heads=9, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(qkv):
        A = qkv.shape[-1] // 3
        return jnp.sum(jnp.sin(_xla_flat(
            qkv[..., :A], qkv[..., A:2 * A], qkv[..., 2 * A:], scale, 9
        )))

    g_ours = jax.grad(loss_qkv)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=3e-5, rtol=3e-5
    )


def test_qkv_bf16_long_seq_base2_consistency():
    """bf16 >2048-token callers mix paths: the fused-qkv FORWARD stores
    base-2 lse (base2=True) and the backward falls back to the blocked
    kernels — which must also run base2 so the stored lse is interpreted
    in the right units. A base mismatch is a ~ln2 scale error on every
    gradient, far outside this tolerance."""
    q, k, v = _flat_qkv(N=2100, B=1, H=1)
    qkv = jnp.concatenate([q, k, v], axis=-1).astype(jnp.bfloat16)
    scale = 64**-0.5

    def loss_qkv(qkv):
        out = flash_attention_qkv(
            qkv, scale=scale, num_heads=1, interpret=True
        )
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_ref(qkv):
        A = qkv.shape[-1] // 3
        return jnp.sum(jnp.sin(_xla_flat(
            qkv[..., :A].astype(jnp.float32),
            qkv[..., A:2 * A].astype(jnp.float32),
            qkv[..., 2 * A:].astype(jnp.float32), scale, 1,
        )))

    g_ours = jax.grad(loss_qkv)(qkv).astype(jnp.float32)
    g_ref = jax.grad(loss_ref)(qkv.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=0.05, rtol=0.08
    )


def test_mh_bf16_blocked_grads_base2():
    """bf16 grads through the BLOCKED (B, N, H*D) path — every kernel
    pair (fwd/bwd) must agree on the lse base (regression: the blocked
    backward once defaulted to base2=False against a base-2 lse)."""
    q, k, v = (t.astype(jnp.bfloat16) for t in _flat_qkv(N=300, B=1, H=2))
    scale = 64**-0.5

    def loss_mh(q, k, v):
        o = flash_attention_mh(
            q, k, v, scale=scale, num_heads=2, interpret=True
        )
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_flat(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), scale, 2,
        )))

    g1 = jax.grad(loss_mh, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32),
    )
    for a, b, nm in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), atol=0.05,
            rtol=0.08, err_msg=nm,
        )
