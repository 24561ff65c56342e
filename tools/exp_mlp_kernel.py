"""Microbench: decode-shape MLP (LN -> x@w1 -> gelu -> @w2 -> +res).

XLA fuses the decode MLP with the LayerNorm stats into one fusion that the
bs500 trace times at ~143us/layer-step vs a ~76us stream bound
(convert_reduce_fusion, 26% of AR device time). This probes whether a
Pallas kernel with hidden-chunked weight streaming beats the XLA emitter.

Chains 24 distinct layer weights (HBM-resident, like the real body) x
EXP_ITERS scan steps.

Usage: python tools/exp_mlp_kernel.py [B ...]
Env:   EXP_ITERS (default 50), EXP_CHUNK (default 1536)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.models.rqtransformer import model as M

C, H = 1536, 6144
L = 24
DT = jnp.bfloat16
ITERS = int(os.environ.get("EXP_ITERS", "50"))
CHUNK = int(os.environ.get("EXP_CHUNK", "1536"))


def xla_mlp(x, ln_s, ln_b, w1, b1, w2, b2):
    h = M.layer_norm(x, ln_s, ln_b)
    return x + (M.gelu(h @ w1 + b1, "v1") @ w2 + b2)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, h_s, acc_s):
    """Grid over hidden chunks; x resident, w1/w2 chunks streamed."""
    i = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        msq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = jnp.maximum(msq - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + M.LN_EPS)
        h_s[:] = (y * lns_ref[:] + lnb_ref[:]).astype(h_s.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    from rqvae_tpu.ops.decode_layer_kernel import _gelu

    t = jnp.dot(h_s[:], w1_ref[:], preferred_element_type=jnp.float32)
    t = _gelu(t + b1_ref[:].astype(jnp.float32), "v1")
    acc_s[:] += jnp.dot(
        t.astype(DT), w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(i == nc - 1)
    def _():
        o_ref[:] = (
            x_ref[:].astype(jnp.float32) + acc_s[:] + b2_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pallas_mlp(x, ln_s, ln_b, w1, b1, w2, b2, chunk=CHUNK):
    B = x.shape[0]
    nc = H // chunk
    return pl.pallas_call(
        _mlp_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),  # chunked bias as 2D
            pl.BlockSpec((chunk, C), lambda i: (i, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, C), DT),
            pltpu.VMEM((B, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(x, ln_s, ln_b, w1, b1.reshape(1, H), w2, b2)


def fetch(x):
    return np.asarray(x)


def main():
    bss = [int(a) for a in sys.argv[1:]] or [100, 500]
    x0s = jnp.zeros((), jnp.float32)
    fetch(x0s + 1)
    ts = []
    for _ in range(7):
        t0 = time.time()
        fetch(x0s + 1)
        ts.append(time.time() - t0)
    rtt = float(np.median(ts))
    print(f"# tunnel RTT {rtt*1e3:.1f} ms (subtracted)", flush=True)
    gb = L * (C * H * 2 * 2) / 1e9  # w1+w2 bf16 per step

    for B in bss:

        @jax.jit
        def _init():
            # ONE jitted init: eager per-op dispatch through the tunnel
            # costs a remote compile each (~25s x 50 tensors)
            ks = jax.random.split(jax.random.PRNGKey(0), 7)
            x0 = jax.random.normal(ks[0], (B, C), jnp.float32).astype(DT)
            lns = [jax.random.normal(k, (C,)) * 0.1 + 1.0
                   for k in jax.random.split(ks[1], L)]
            lnb = [jax.random.normal(k, (C,)) * 0.1
                   for k in jax.random.split(ks[2], L)]
            w1s = [jax.random.normal(k, (C, H), jnp.float32).astype(DT) * 0.02
                   for k in jax.random.split(ks[3], L)]
            w2s = [jax.random.normal(k, (H, C), jnp.float32).astype(DT) * 0.02
                   for k in jax.random.split(ks[4], L)]
            return x0, lns, lnb, w1s, w2s

        x0, lns, lnb, w1s, w2s = _init()
        b1s = [jnp.zeros((H,), DT) for _ in range(L)]
        b2s = [jnp.zeros((C,), DT) for _ in range(L)]

        def chain(fn, x0, W):
            # weights must be jit ARGS: a closure embeds them as HLO
            # constants and the remote-compile upload rejects the body
            # (HTTP 413) or crawls for many minutes
            lns, lnb, w1s, w2s, b1s, b2s = W

            def step(x, _):
                for l in range(L):
                    x = fn(x, lns[l], lnb[l], w1s[l], b1s[l], w2s[l], b2s[l])
                return x, ()

            y, _ = jax.lax.scan(step, x0, None, length=ITERS)
            return y.sum()

        W = (lns, lnb, w1s, w2s, b1s, b2s)

        # numeric check first (jit both: eager ops each pay a remote compile)
        ref1 = jax.jit(xla_mlp)(x0, lns[0], lnb[0], w1s[0], b1s[0], w2s[0], b2s[0])
        got1 = pallas_mlp(x0, lns[0], lnb[0], w1s[0], b1s[0], w2s[0], b2s[0])
        err = np.abs(np.asarray(ref1, np.float32) - np.asarray(got1, np.float32)).max()

        row = [f"B={B:4d} ({gb*1e3:5.0f} MB/step) maxdiff={err:.1e}"]
        for name, fn in (("xla", xla_mlp), ("pallas", pallas_mlp)):
            f = jax.jit(functools.partial(chain, fn))
            try:
                fetch(f(x0, W))
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    fetch(f(x0, W))
                    best = min(best, time.time() - t0)
                t = max(best - rtt, 1e-9) / ITERS / L
                row.append(f"{name} {t*1e6:7.1f}us ({gb/L/t:5.0f} GB/s)")
            except Exception as e:
                row.append(f"{name} FAIL: {type(e).__name__}: {str(e)[:140]}")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
