"""Kernel-rate experiment: int8-quantized KV cache vs bf16 in the Pallas
decode attention (ops/attention_kernel.py::decode_attention_q8).

Rationale: at bs500 the KV cache is ~60% of AR HBM bytes/position; int8
halves the cache stream while the per-(token, head) scales fold into the
[B, T, nh] score/weight matrices (1/64 of the cache tile) — near-zero
extra VPU work. This measures the isolated kernel stream rates at the
1.4B body geometry before any sampler integration.

Usage: python tools/exp_attn_q8cache.py [B ...]   (default 100 500)
Env:   EXP_T (cache window, default 64), EXP_ITERS (default 50)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.ops import attention_kernel as AK

C, NH = 1536, 24
T = int(os.environ.get("EXP_T", "64"))
ITERS = int(os.environ.get("EXP_ITERS", "50"))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [100, 500]
    r = np.random.RandomState(0)
    for B in batches:
        q = jnp.asarray(r.randn(B, C), jnp.bfloat16)
        kn = jnp.asarray(r.randn(B, C), jnp.bfloat16)
        vn = jnp.asarray(r.randn(B, C), jnp.bfloat16)
        kc = jnp.asarray(r.randn(B, T, C).astype(np.float32))
        vc = jnp.asarray(r.randn(B, T, C).astype(np.float32))
        kq, ks = jax.vmap(AK.quantize_kv, in_axes=(1, None), out_axes=1)(kc, NH)
        vq, vs = jax.vmap(AK.quantize_kv, in_axes=(1, None), out_axes=1)(vc, NH)
        kc16, vc16 = kc.astype(jnp.bfloat16), vc.astype(jnp.bfloat16)
        ks, vs = ks.astype(jnp.bfloat16), vs.astype(jnp.bfloat16)
        cur = jnp.int32(T - 1)

        @jax.jit
        def chain_bf16(q, kn, vn, kc16, vc16):
            def one(x, _):
                y = AK.decode_attention(x, kn, vn, kc16, vc16, cur, NH)
                return y.astype(jnp.bfloat16), ()
            return jax.lax.scan(one, q, None, length=ITERS)[0].sum()

        @jax.jit
        def chain_q8(q, kn, vn, kq, ks, vq, vs):
            def one(x, _):
                y = AK.decode_attention_q8(x, kn, vn, kq, ks, vq, vs, cur, NH)
                return y.astype(jnp.bfloat16), ()
            return jax.lax.scan(one, q, None, length=ITERS)[0].sum()

        def bench(fn, *args):
            np.asarray(fn(*args))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(*args))
                best = min(best, (time.time() - t0) / ITERS)
            return best

        bytes_bf = 2 * B * T * C * 2
        bytes_q8 = 2 * B * T * C + 2 * B * T * NH * 2
        t_bf = bench(chain_bf16, q, kn, vn, kc16, vc16)
        print(
            f"B={B:4d} T={T}: bf16 {t_bf*1e6:8.1f} us  "
            f"{bytes_bf/t_bf/1e9:6.0f} GB/s",
            flush=True,
        )
        t_q8 = bench(chain_q8, q, kn, vn, kq, ks, vq, vs)
        print(
            f"B={B:4d} T={T}: q8   {t_q8*1e6:8.1f} us  "
            f"{bytes_q8/t_q8/1e9:6.0f} GB/s (int8 bytes)  "
            f"speedup {t_bf/t_q8:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
