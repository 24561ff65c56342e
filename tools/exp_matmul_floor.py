"""Microbenchmark: the XLA matmul floor for the decode workload.

The sampler's weight matmuls (model.py::_mm) measure 310 ms/iter in the
trace — ~69% of their weight-streaming roofline. This isolates a chain of
MLP-shaped matmuls (42 layers x [1536x6144 + 6144x1536], distinct weights,
sequential dependency, 63 steps) to find what XLA can actually do:

  o1: activations [B, C]   (batch in sublanes — the sampler's orientation)
  o2: activations [C, B]   (batch in lanes; weights become the M side)

Floor for 42 x 37.8 MB bf16 weights at 819 GB/s: 1.94 ms/step.

Usage: EXP_BS=100 python tools/exp_matmul_floor.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import rqvae_tpu  # noqa: F401  (compile cache)

BS = int(os.environ.get("EXP_BS", "100"))
C = 1536
F = 4 * C
L = 42
STEPS = 63
DTYPE = jnp.bfloat16


def fetch(x):
    return np.asarray(x)


def timeit(fn, n=3, label=""):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    per_step = best / STEPS * 1e3
    print(f"# {label}: {per_step:.3f} ms/step  ({best/BS*1000:.3f} ms/sample-equiv)", flush=True)
    return best


def compile_opts():
    """EXP_XLA_OPT='k=v,k=v' -> compiler_options dict (axon accepts these
    per-compile where client-side XLA_FLAGS are rejected)."""
    s = os.environ.get("EXP_XLA_OPT", "")
    if not s:
        return None
    return dict(kv.split("=", 1) for kv in s.split(",") if kv)


def jit_with_opts(fn, *args):
    opts = compile_opts()
    if opts is None:
        return jax.jit(fn)
    return jax.jit(fn).lower(*args).compile(compiler_options=opts)


def main():
    print(f"# backend {jax.default_backend()}, bs {BS}, opts {compile_opts()}", flush=True)
    k = jax.random.PRNGKey(0)

    @jax.jit
    def init(k):
        ks = jax.random.split(k, 2 * L)
        w1 = [jax.random.normal(ks[2 * i], (C, F), DTYPE) * 0.02 for i in range(L)]
        w2 = [jax.random.normal(ks[2 * i + 1], (F, C), DTYPE) * 0.02 for i in range(L)]
        return w1, w2

    w1, w2 = init(k)
    fetch(w1[0].sum())
    gb = (L * (C * F + F * C) * 2) / 1e9
    print(f"# weights {gb:.2f} GB/step -> floor {gb/819*1e3:.2f} ms/step", flush=True)

    def o1(w1, w2, x):  # x [B, C]
        def step(x, _):
            for i in range(L):
                h = x @ w1[i]
                x = h @ w2[i] + x
            return x, ()

        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x.sum()

    x = jax.random.normal(jax.random.PRNGKey(1), (BS, C), DTYPE)
    o1c = jit_with_opts(o1, w1, w2, x)
    fetch(o1c(w1, w2, x))
    timeit(lambda: fetch(o1c(w1, w2, x)), 3, "o1 [B,C] @ [C,F]")

    def o2(w1, w2, xt):  # xt [C, B]
        def step(xt, _):
            for i in range(L):
                h = jnp.einsum("cf,cb->fb", w1[i], xt, preferred_element_type=DTYPE)
                xt = jnp.einsum("fc,fb->cb", w2[i], h, preferred_element_type=DTYPE) + xt
            return xt, ()

        xt, _ = jax.lax.scan(step, xt, None, length=STEPS)
        return xt.sum()

    xt = jnp.asarray(x.T)
    o2c = jit_with_opts(o2, w1, w2, xt)
    fetch(o2c(w1, w2, xt))
    timeit(lambda: fetch(o2c(w1, w2, xt)), 3, "o2 [C,B] weights-as-M")


if __name__ == "__main__":
    main()
