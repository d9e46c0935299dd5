"""Fused LN+Linear kernel: numerics vs the unfused reference and grads
vs autodiff (interpreter mode on CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofo_tpu.ops.fused_ln import ln_linear, manual_layer_norm


def _ref(x, gamma, beta, w, b):
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    return y @ w + b


def _setup(M=48, D=64, N=96, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (M, D), dtype) * 2.0 + 0.5
    gamma = jax.random.normal(ks[1], (D,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (D,)) * 0.1
    w = (jax.random.normal(ks[3], (D, N)) * 0.05).astype(dtype)
    b = (jax.random.normal(ks[4], (N,)) * 0.01).astype(dtype)
    return x, gamma, beta, w, b


class TestForward:
    def test_matches_unfused(self):
        x, gamma, beta, w, b = _setup()
        out = ln_linear(x, gamma, beta, w, b, interpret=True)
        ref = _ref(x, gamma, beta, w, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_manual_layer_norm_matches_flax(self):
        x, gamma, beta, _, _ = _setup(D=96)
        ours = manual_layer_norm(x, gamma, beta, dtype=jnp.float32)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-6, atol=2e-6
        )

    def test_row_padding(self):
        # M not a multiple of the 256-row block exercises the pad path
        x, gamma, beta, w, b = _setup(M=300, D=64, N=128)
        out = ln_linear(x, gamma, beta, w, b, interpret=True)
        ref = _ref(x, gamma, beta, w, b)
        assert out.shape == (300, 128)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_batched_leading_dims(self):
        x, gamma, beta, w, b = _setup(M=24, D=64, N=96)
        x3 = x.reshape(2, 12, 64)
        out = ln_linear(x3, gamma, beta, w, b, interpret=True)
        assert out.shape == (2, 12, 96)

    def test_bf16_io(self):
        x, gamma, beta, w, b = _setup(dtype=jnp.bfloat16)
        out = ln_linear(x, gamma, beta, w, b, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = _ref(
            x.astype(jnp.float32), gamma, beta,
            w.astype(jnp.float32), b.astype(jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref),
            rtol=0.05, atol=0.05,
        )


class TestBlockIntegration:
    """Block(fuse_ln=True) must match Block(fuse_ln=False) numerically
    and produce the identical parameter tree (checkpoint compat)."""

    def _block(self, fuse):
        from mofo_tpu.models.layers import Block

        return Block(dim=64, num_heads=4, qkv_bias=True,
                     dtype=jnp.float32, fuse_ln=fuse)

    def test_fused_block_matches_unfused(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
        params = self._block(False).init(jax.random.PRNGKey(0), x)
        out_ref = self._block(False).apply(params, x)
        out_fused = self._block(True).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref),
            rtol=2e-5, atol=2e-5,
        )

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 8, 64))
        p0 = self._block(False).init(jax.random.PRNGKey(0), x)
        p1 = self._block(True).init(jax.random.PRNGKey(0), x)
        t0 = jax.tree_util.tree_structure(p0)
        t1 = jax.tree_util.tree_structure(p1)
        assert t0 == t1
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_block_grads_match(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 64))
        params = self._block(False).init(jax.random.PRNGKey(0), x)

        def loss(p, fuse):
            o = self._block(fuse).apply(p, x)
            return jnp.sum(o * jnp.cos(o))

        g_ref = jax.grad(lambda p: loss(p, False))(params)
        g_fused = jax.grad(lambda p: loss(p, True))(params)
        for a, r in zip(jax.tree_util.tree_leaves(g_fused),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=5e-4, atol=1e-5
            )


class TestBackward:
    def test_grads_match_autodiff(self):
        x, gamma, beta, w, b = _setup()

        def fused_loss(x, gamma, beta, w, b):
            o = ln_linear(x, gamma, beta, w, b, interpret=True)
            return jnp.sum(jnp.sin(o) * o)

        def ref_loss(x, gamma, beta, w, b):
            o = _ref(x, gamma, beta, w, b)
            return jnp.sum(jnp.sin(o) * o)

        gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, b
        )
        gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, b
        )
        for a, r, name in zip(gf, gr, "x gamma beta w b".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-5,
                err_msg=name,
            )


class TestMMStatsLN:
    def test_matches_flax_layernorm(self):
        """mm_stats_layer_norm (MXU statistics) vs nn.LayerNorm on bf16
        inputs — must agree to bf16 precision (both use fast variance
        and f32 stat accumulation)."""
        import flax.linen as nn

        from mofo_tpu.ops.fused_ln import mm_stats_layer_norm

        rng = np.random.RandomState(3)
        x = jnp.asarray(
            rng.randn(4, 37, 128).astype(np.float32) * 1.5 + 0.7
        ).astype(jnp.bfloat16)
        gamma = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(128).astype(np.float32))
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        ref = ln.apply(
            {"params": {"scale": gamma, "bias": beta}}, x
        ).astype(jnp.bfloat16)
        got = mm_stats_layer_norm(x, gamma, beta, dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_block_param_tree_unchanged(self, monkeypatch):
        """MOFO_LN=mm must produce the identical parameter tree (the
        _LNParams declaration mirrors nn.LayerNorm)."""
        from mofo_tpu.models.layers import Block

        x = jnp.zeros((1, 8, 64), jnp.bfloat16)
        blk = Block(dim=64, num_heads=2, dtype=jnp.bfloat16)
        p_flax = blk.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("MOFO_LN", "mm")
        p_mm = blk.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree.structure(p_flax) == jax.tree.structure(p_mm)
        # same values too (declaration order / init must not shift)
        for a, b in zip(jax.tree.leaves(p_flax), jax.tree.leaves(p_mm)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMMVJPLN:
    def test_fwd_and_grads_match_flax(self):
        """mmvjp_layer_norm: forward AND all gradients must match flax
        nn.LayerNorm autodiff to bf16-rounding tolerance."""
        import flax.linen as nn

        from mofo_tpu.ops.fused_ln import mmvjp_layer_norm

        rng = np.random.RandomState(5)
        x = jnp.asarray(
            rng.randn(3, 29, 128).astype(np.float32) * 1.3 + 0.4
        ).astype(jnp.bfloat16)
        gamma = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(128).astype(np.float32))
        dy = jnp.asarray(rng.randn(3, 29, 128).astype(np.float32))
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)

        def loss_ref(x, gamma, beta):
            y = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
            return jnp.sum(y * dy)

        def loss_mm(x, gamma, beta):
            y = mmvjp_layer_norm(x, gamma, beta, dtype=jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) * dy)

        y_ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
        y_mm = mmvjp_layer_norm(x, gamma, beta, dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(y_mm, np.float32), np.asarray(y_ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        g_mm = jax.grad(loss_mm, argnums=(0, 1, 2))(x, gamma, beta)
        # param-grad dots consume bf16-rounded cotangents — the same
        # operand precision as every dW matmul in the bf16 step
        for a, b, nm, tol in zip(
            g_mm, g_ref, ("dx", "dgamma", "dbeta"), (0.15, 0.3, 0.06)
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=tol, atol=tol, err_msg=nm,
            )
