"""q8 weight-streaming kernel chunk-size sweep (HBM-resident 16-layer
chain, decode shapes). The end-to-end int8 trace shows fused_proj_mlp_q8
at ~212 ms/iter where perfect byte-scaling of the bf16 kernel's 310 would
give ~161 — is the shortfall the int8 DMA block size (same chunk = half
the bytes per block) or inherent? Sweep chunks; bigger blocks restore the
per-DMA byte count.

Run: python tools/exp_q8_chunk.py [bs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import decode_layer_kernel as DL

B = int(sys.argv[1]) if len(sys.argv) > 1 else 100
C, H, L = 1536, 6144, 16
dt = jnp.bfloat16


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, C)).astype(dt)
    y = jax.random.normal(ks[1], (B, C)).astype(dt)
    lns = jnp.ones((C,))
    lnb = jnp.zeros((C,))
    bo = jnp.zeros((C,), dt)
    b1 = jnp.zeros((H,), dt)
    b2 = jnp.zeros((C,), dt)

    # weights MUST be jit ARGS (closing over them embeds them as HLO
    # constants -> the remote compile uploads them, HTTP 413; CLAUDE.md)
    wos = [M._quantize_weight(jax.random.normal(k, (C, C)) * 0.05)
           for k in jax.random.split(ks[2], L)]
    w1s = [M._quantize_weight(jax.random.normal(k, (C, H)) * 0.05)
           for k in jax.random.split(ks[3], L)]
    w2s = [M._quantize_weight(jax.random.normal(k, (H, C)) * 0.05)
           for k in jax.random.split(ks[4], L)]

    def bench(fn, *args):
        np.asarray(fn(*args))
        t0 = time.time()
        n = 8
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        return (time.time() - t0) / n

    gb_q8 = L * (C * C + 2 * C * H) / 1e9
    for chunk in (1536, 3072, 6144):
        @jax.jit
        def chain(x, y, wos, w1s, w2s, _chunk=chunk):
            acc = x
            for i in range(L):
                acc = DL.fused_proj_mlp_q8(
                    acc, y, wos[i].q, wos[i].scale, bo, lns, lnb,
                    w1s[i].q, w1s[i].scale, b1, w2s[i].q, w2s[i].scale, b2,
                    chunk=_chunk,
                ).astype(dt)
            return acc.sum()

        t = bench(chain, x, y, wos, w1s, w2s)
        print(
            f"# proj_mlp_q8 bs{B} chunk={chunk}: {t/L*1e6:7.1f} us/layer "
            f"({gb_q8/t:5.0f} GB/s of int8 bytes)",
            flush=True,
        )


if __name__ == "__main__":
    main()
