"""Flash-attention kernel micro-benchmark at the MOFO shapes.

Chained-dispatch methodology (CLAUDE.md measurement rules): K dispatches
with a data dependence through a scalar folded into the inputs, one
scalar fetch at the end. Reports ms and achieved TF/s for fwd and
fwd+bwd at the decoder (B, 1568, 6x64) and encoder (B, 160, 12x64)
shapes, for both the Pallas multihead kernel and the XLA path.

Usage: python tools/flashbench.py [--b 48] [--shapes dec enc] [--k 20]
Env: MOFO_FLASH_BLOCK to override the q-block size.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def attn_flops(b, n, heads, d, bwd=False):
    # QK^T + PV: 2 matmuls of 2*n*n*d flops per head; backward = 5 such
    # matmuls (s recompute, dp, dq, dk, dv)
    f = b * heads * 2 * (2 * n * n * d)
    if bwd:
        f = f + b * heads * 5 * (2 * n * n * d)
    return f


def timed(fn, args, k):
    f = jax.jit(fn)
    s = jnp.bfloat16(1.0)  # keep q*s in bf16 — f32 doubles kernel VMEM
    out = f(s, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(k):
        s = jnp.bfloat16(1.0) + out.astype(jnp.bfloat16) * jnp.bfloat16(1e-12)
        out = f(s, *args)
    float(out)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=48)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--shapes", nargs="+", default=["dec"])
    ap.add_argument("--impls", nargs="+", default=["pallas"])
    args = ap.parse_args()

    from mofo_tpu.core.cache import enable_compilation_cache
    from mofo_tpu.ops.flash_attention import flash_attention_mh
    from mofo_tpu.ops.attention import xla_attention

    enable_compilation_cache()

    geoms = {"dec": (1568, 6, 64), "enc": (160, 12, 64)}
    B = args.b
    for name in args.shapes:
        n, h, d = geoms[name]
        a = h * d
        scale = d ** -0.5
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, n, a), jnp.bfloat16)
        kk_ = jax.random.normal(kk, (B, n, a), jnp.bfloat16)
        v = jax.random.normal(kv, (B, n, a), jnp.bfloat16)

        def mh_fwd(s, q, k, v):
            o = flash_attention_mh(q * s, k, v, scale=scale, num_heads=h)
            return jnp.sum(o.astype(jnp.float32))

        def mh_fb(s, q, k, v):
            def loss(q, k, v):
                o = flash_attention_mh(q, k, v, scale=scale, num_heads=h)
                return jnp.sum(o.astype(jnp.float32))

            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                q * s, k, v
            )
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

        def xla_fwd(s, q, k, v):
            qh = (q * s).reshape(B, n, h, d).transpose(0, 2, 1, 3)
            kh = k.reshape(B, n, h, d).transpose(0, 2, 1, 3)
            vh = v.reshape(B, n, h, d).transpose(0, 2, 1, 3)
            o = xla_attention(qh, kh, vh, scale=scale)
            return jnp.sum(o.astype(jnp.float32))

        def xla_fb(s, q, k, v):
            def loss(q, k, v):
                qh = q.reshape(B, n, h, d).transpose(0, 2, 1, 3)
                kh = k.reshape(B, n, h, d).transpose(0, 2, 1, 3)
                vh = v.reshape(B, n, h, d).transpose(0, 2, 1, 3)
                o = xla_attention(qh, kh, vh, scale=scale)
                return jnp.sum(o.astype(jnp.float32))

            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                q * s, k, v
            )
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

        cases = []
        if "pallas" in args.impls:
            cases += [("mh fwd", mh_fwd, False), ("mh f+b", mh_fb, True)]
        if "xla" in args.impls:
            cases += [("xla fwd", xla_fwd, False), ("xla f+b", xla_fb, True)]
        for label, fn, bwd in cases:
            ms = timed(fn, (q, kk_, v), args.k)
            tf = attn_flops(B, n, h, d, bwd) / (ms * 1e-3) / 1e12
            print(f"{name} B={B} {label:8s} {ms:7.2f} ms  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
