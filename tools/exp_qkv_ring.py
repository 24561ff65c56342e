"""QKV DMA-ring experiment (VERDICT r4 item 1a).

Round 4 proved ~13% of the q8 dense cost was pipeline depth, not transfer
size — but only applied the explicit DMA ring to proj+MLP
(decode_layer_kernel.fused_proj_mlp_q8_ring). The q8 QKV kernel kept the
2-deep grid pipeline, and its stream is SHORTER (N=3C -> only 3 chunks at
chunk=1536), so the ramp latency fraction is even larger. Measure the ring
variant (fused_ln_qkv_q8_ring) against the grid kernel on a dependent
16-layer QKV chain (x <- q-slice of the output feeds the next layer), the
same methodology as tools/exp_q8_pipeline.py: EXP_ITERS>=100 scan chains,
min-of-3 fetch timing.

Run: python tools/exp_qkv_ring.py [bs]      (real TPU)
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
C, L = 1536, 16
N = 3 * C
dt = jnp.bfloat16


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, C)).astype(dt)
    lns = jnp.ones((C,))
    lnb = jnp.zeros((C,))
    bqkv = jnp.zeros((N,), dt)
    ws = [M._quantize_weight(jax.random.normal(k, (C, N)) * 0.05)
          for k in jax.random.split(ks[1], L)]

    ITERS = int(os.environ.get("EXP_ITERS", "100"))
    bytes_q8 = L * C * N  # int8 weight bytes per chain step

    def bench(fn, *args):
        np.asarray(fn(*args))  # compile
        best = float("inf")
        for _ in range(3):  # tunnel fetch latency spikes: min-of-3
            t0 = time.time()
            np.asarray(fn(*args))
            best = min(best, time.time() - t0)
        return best / ITERS

    def make_chain(kernel_kwargs=None):
        ring = kernel_kwargs is not None

        @jax.jit
        def chain(x, ws):
            def one(x, _):
                for w in ws:
                    if ring:
                        qkv = DL.fused_ln_qkv_q8_ring(
                            x, lns, lnb, w.q, w.scale, bqkv, **kernel_kwargs
                        )
                    else:
                        qkv = DL.fused_ln_qkv_q8(x, lns, lnb, w.q, w.scale, bqkv)
                    x = qkv[:, :C]  # dependent chain: q slice feeds next LN
                return x, ()
            return jax.lax.scan(one, x, None, length=ITERS)[0].sum()
        return chain

    t0 = bench(make_chain(None), x, ws)
    print(f"q8 QKV grid-pipeline (shipped): {t0*1e3:7.2f} ms  "
          f"{bytes_q8/t0/1e9:6.0f} GB/s (int8 bytes)", flush=True)

    # numeric check vs the grid kernel
    o_ref = DL.fused_ln_qkv_q8(x, lns, lnb, ws[0].q, ws[0].scale, bqkv)
    o_ring = DL.fused_ln_qkv_q8_ring(x, lns, lnb, ws[0].q, ws[0].scale, bqkv)
    d = np.abs(np.asarray(o_ring, np.float32) - np.asarray(o_ref, np.float32))
    print(f"ring vs grid: mean|d| {d.mean():.6f} max|d| {d.max():.6f}",
          flush=True)

    for chunk in (1536, 768, 512):
        for n_buf in (2, 3, 4, 6):
            if (N // chunk) < n_buf:
                continue
            try:
                t = bench(make_chain(dict(chunk=chunk, n_buf=n_buf)), x, ws)
                print(
                    f"q8 QKV ring chunk={chunk:5d} n_buf={n_buf}: "
                    f"{t*1e3:7.2f} ms  {bytes_q8/t/1e9:6.0f} GB/s (int8 bytes)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — sweep survives bad configs
                print(f"q8 QKV ring chunk={chunk:5d} n_buf={n_buf}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
