"""Microbench elementwise/transcendental op cost on the chip.

Chained in-program iterations (fori_loop with data dependence) so the
measurement is device-bound, one scalar fetched at the end. Usage:
    python tools/vpu_micro.py [n_iters]
"""

import sys
import time

import jax
import jax.numpy as jnp


def bench(name, fn, x, iters=30):
    @jax.jit
    def run(x):
        def body(i, acc):
            # vary the input with i so nothing is loop-invariant
            y = fn(acc + i * 1e-6)
            return y * 0.999
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    run(x).block_until_ready()
    t0 = time.perf_counter()
    v = float(run(x))
    dt = (time.perf_counter() - t0) / iters
    el = x.size
    print(f"{name:24s} {dt*1e3:7.3f} ms/iter  "
          f"{el/dt/1e9:7.1f} Gelem/s  (v={v:.3g})")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    shape = (48, 1568, 1536)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    xb = x.astype(jnp.bfloat16)

    inv_sqrt2 = 0.7071067811865476

    def gelu_erf(x):
        return 0.5 * x * (1.0 + jax.lax.erf(x * inv_sqrt2))

    def gelu_tanh(x):
        return jax.nn.gelu(x, approximate=True)

    # division-free odd polynomial for erf(x/sqrt2) as used in gelu:
    # placeholder degree-6-in-x^2 to gauge FMA chain cost (not accurate)
    def gelu_poly(x):
        z = x * inv_sqrt2
        z2 = z * z
        p = 1.1283791670955126
        for c in (-0.3761263890318375, 0.11283791670955126,
                  -0.026866170645131251, 0.0052239776254421878,
                  -0.00085483270234508528):
            p = p * z2 + c
        return 0.5 * x * (1.0 + z * p)

    for name, fn, inp in [
        ("copy f32", lambda v: v + 1.0, x),
        ("copy bf16", lambda v: v + 1.0, xb),
        ("erf f32", jax.lax.erf, x),
        ("exp f32", jnp.exp, x),
        ("tanh f32", jnp.tanh, x),
        ("logistic f32", jax.nn.sigmoid, x),
        ("rsqrt f32", jax.lax.rsqrt, x),
        ("div f32", lambda v: 1.0 / (v * v + 1.0), x),
        ("poly6 f32", lambda v: gelu_poly(v) - v, x),
        ("gelu erf f32", gelu_erf, x),
        ("gelu tanh f32", gelu_tanh, x),
        ("gelu erf bf16", gelu_erf, xb),
        ("gelu tanh bf16", gelu_tanh, xb),
        ("gelu poly bf16", gelu_poly, xb),
    ]:
        bench(name, fn, inp, iters)


if __name__ == "__main__":
    main()
