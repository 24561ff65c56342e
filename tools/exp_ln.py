"""LayerNorm formulation shootout at decode shapes.

The bs500 AR trace (COVERAGE.md round-3 decomposition) shows each
[500, 1536] one-pass LN fusion costing ~148 us — more than the Pallas
decode-attention call itself — because the statistics are LANE-dim
reduces on the VPU. Candidates to move the reduces off the lane network:

  onepass   current model.layer_norm (fp32 convert + multi-output reduce)
  mxu       stats as matvecs against a ones column: mean via bf16 MXU dot
            (fp32 accumulate — bit-identical sum), E[x^2] via fp32 square
            + HIGHEST-precision dot
  mxu_bf16  same but E[x^2] from the bf16 square (2 bf16 dots; cheaper,
            ~2^-9 relative error on the variance)
  twopass   textbook mean/var chain (baseline)
  resh      reshape [B, C] -> [B, C/128, 128]: sublane-dim partial reduce
            first, lane reduce only on the [B, 128] remainder

Each variant runs in a DEPENDENT scan chain (output feeds input) like the
real decode loop. Usage: python tools/exp_ln.py [B ...] (default 100 500)
Env: EXP_ITERS (default 200)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.models.rqtransformer.model import layer_norm, LN_EPS

C = 1536
ITERS = int(os.environ.get("EXP_ITERS", "200"))


def ln_mxu(x, scale, bias):
    ones = jnp.ones((C, 1), jnp.bfloat16)
    s1 = jnp.dot(x.astype(jnp.bfloat16), ones, preferred_element_type=jnp.float32)
    mean = s1 / C
    x32 = x.astype(jnp.float32)
    sq = x32 * x32
    s2 = jnp.dot(
        sq, ones.astype(jnp.float32), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    var = jnp.maximum(s2 / C - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def ln_mxu_bf16(x, scale, bias):
    ones = jnp.ones((C, 1), jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    s1 = jnp.dot(xb, ones, preferred_element_type=jnp.float32)
    s2 = jnp.dot(xb * xb, ones, preferred_element_type=jnp.float32)
    mean = s1 / C
    var = jnp.maximum(s2 / C - mean * mean, 0.0)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def ln_twopass(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def ln_resh(x, scale, bias):
    B = x.shape[0]
    x32 = x.astype(jnp.float32).reshape(B, C // 128, 128)
    s1 = jnp.sum(x32, axis=1)  # sublane-dim reduce
    s2 = jnp.sum(x32 * x32, axis=1)
    mean = (jnp.sum(s1, axis=-1, keepdims=True) / C)
    msq = (jnp.sum(s2, axis=-1, keepdims=True) / C)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


VARIANTS = {
    "onepass": layer_norm,
    "mxu": ln_mxu,
    "mxu_bf16": ln_mxu_bf16,
    "twopass": ln_twopass,
    "resh": ln_resh,
}


def main():
    batches = [int(a) for a in sys.argv[1:]] or [100, 500]
    r = np.random.RandomState(0)
    scale = jnp.asarray(r.randn(C) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(r.randn(C) * 0.1, jnp.float32)
    for B in batches:
        x = jnp.asarray(r.randn(B, C), jnp.bfloat16)
        ref = np.asarray(jax.jit(layer_norm)(x, scale, bias), np.float32)
        for name, fn in VARIANTS.items():
            err = np.abs(np.asarray(jax.jit(fn)(x, scale, bias), np.float32) - ref).max()

            @jax.jit
            def chain(x):
                def one(h, _):
                    return fn(h, scale, bias), ()
                return jax.lax.scan(one, x, None, length=ITERS)[0].sum()

            np.asarray(chain(x))
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                np.asarray(chain(x))
                best = min(best, (time.time() - t0) / ITERS)
            print(
                f"B={B:4d} {name:9s}: {best*1e6:7.1f} us/LN   max|err|={err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
