"""SPMD partitioning of the Pallas kernels (ops/sharded_kernel.py).

Without custom_partitioning, XLA all-gathers a pallas_call's operands
under a sharded jit and replicates the kernel on every device. These
tests pin the fix: on an 8-device mesh with batch-sharded inputs the
flash kernels must (a) emit NO all-gather, (b) keep the batch sharding
on the output, (c) match the unsharded result exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mofo_tpu.ops.flash_attention import flash_attention, flash_attention_mh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))


def _qkv(B=8, N=128, H=2, Dh=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, N, H * Dh)
    return [jax.random.normal(k, shape, jnp.float32) for k in ks]


class TestMultiheadFlashSharding:
    def test_no_allgather_and_sharded_output(self):
        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        q, k, v = [jax.device_put(x, sh) for x in _qkv()]

        @jax.jit
        def f(q, k, v):
            return flash_attention_mh(
                q, k, v, scale=0.125, num_heads=2, interpret=True
            )

        hlo = f.lower(q, k, v).compile().as_text()
        assert "all-gather" not in hlo and "all_gather" not in hlo
        out = f(q, k, v)
        assert out.sharding.is_equivalent_to(sh, out.ndim)

    def test_sharded_matches_unsharded(self):
        q, k, v = _qkv(seed=3)
        ref = flash_attention_mh(
            q, k, v, scale=0.125, num_heads=2, interpret=True
        )
        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        qs, ks_, vs = [jax.device_put(x, sh) for x in (q, k, v)]
        out = jax.jit(
            lambda a, b, c: flash_attention_mh(
                a, b, c, scale=0.125, num_heads=2, interpret=True
            )
        )(qs, ks_, vs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_backward_sharded_matches_unsharded(self):
        q, k, v = _qkv(seed=5)

        def loss(q, k, v):
            o = flash_attention_mh(
                q, k, v, scale=0.125, num_heads=2, interpret=True
            )
            return jnp.sum(o * jnp.sin(o))

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        qs, ks_, vs = [jax.device_put(x, sh) for x in (q, k, v)]
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-6
            )

    def test_grad_hlo_has_no_allgather(self):
        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        q, k, v = [jax.device_put(x, sh) for x in _qkv(seed=7)]

        def loss(q, k, v):
            o = flash_attention_mh(
                q, k, v, scale=0.125, num_heads=2, interpret=True
            )
            return jnp.sum(o * o)

        hlo = (
            jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            .lower(q, k, v).compile().as_text()
        )
        assert "all-gather" not in hlo and "all_gather" not in hlo


class TestHeadMajorFlashSharding:
    def test_sharded_matches_unsharded(self):
        B, H, N, Dh = 8, 2, 128, 32
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q, k, v = [
            jax.random.normal(kk, (B, H, N, Dh), jnp.float32) for kk in ks
        ]
        ref = flash_attention(q, k, v, scale=0.125, interpret=True)
        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        qs, ks_, vs = [jax.device_put(x, sh) for x in (q, k, v)]
        out = jax.jit(
            lambda a, b, c: flash_attention(
                a, b, c, scale=0.125, interpret=True
            )
        )(qs, ks_, vs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


class TestMaskedKvBiasSharding:
    """The masked kv-bias flash variant (BB-MCA cross-attention) under
    batch sharding: the bias operand must partition with the batch (no
    all-gather), forward and backward matching the unsharded run."""

    def _bias(self, B=8, N=128, n_masked=40, seed=13):
        key = jax.random.PRNGKey(seed)
        # mask a random suffix of kv positions per row, never all of them
        keep = jax.random.randint(key, (B, 1), N - n_masked, N)
        col = jnp.arange(N)[None, :]
        return jnp.where(col < keep, 0.0, -1e30).astype(jnp.float32)

    def test_fwd_bwd_sharded_matches_unsharded(self):
        q, k, v = _qkv(seed=17)
        bias = self._bias()

        def loss(q, k, v, bias):
            o = flash_attention_mh(
                q, k, v, scale=0.125, num_heads=2, kv_bias=bias,
                interpret=True,
            )
            return jnp.sum(o * jnp.cos(o))

        ref_out = flash_attention_mh(
            q, k, v, scale=0.125, num_heads=2, kv_bias=bias,
            interpret=True,
        )
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, bias)

        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        qs, ks_, vs, bs = [jax.device_put(x, sh) for x in (q, k, v, bias)]
        out = jax.jit(
            lambda a, b, c, d: flash_attention_mh(
                a, b, c, scale=0.125, num_heads=2, kv_bias=d,
                interpret=True,
            )
        )(qs, ks_, vs, bs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6
        )
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs, bs)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-6
            )

    def test_no_allgather(self):
        mesh = _mesh()
        sh = NamedSharding(mesh, P("data"))
        q, k, v = [jax.device_put(x, sh) for x in _qkv(seed=19)]
        bias = jax.device_put(self._bias(), sh)

        def loss(q, k, v, bias):
            o = flash_attention_mh(
                q, k, v, scale=0.125, num_heads=2, kv_bias=bias,
                interpret=True,
            )
            return jnp.sum(o * o)

        hlo = (
            jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            .lower(q, k, v, bias).compile().as_text()
        )
        assert "all-gather" not in hlo and "all_gather" not in hlo
