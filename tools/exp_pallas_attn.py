"""Microbench: decode attention formulations at real sampler shapes.

Compares, per (B, window):
  - XLA 'vpu' broadcast-mul path (model._decode_attention_xla)
  - XLA 'mxu' head-segment-matrix path
  - Pallas fused kernel (ops.attention_kernel.decode_attention), bf16

Each variant runs a dependent chain (y feeds the next q) inside one jit so
the measurement is steady-state HBM streaming, not dispatch. Prints
us/layer-step and effective cache bandwidth.

Usage: python tools/exp_pallas_attn.py [B ...]   (default 100 500)
Env:   EXP_WINDOW (default "33,64"), EXP_ITERS (default 50), EXP_BTILE
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import attention_kernel as AK

C, NH = 1536, 24
DT = jnp.bfloat16
ITERS = int(os.environ.get("EXP_ITERS", "50"))


def fetch(x):
    return np.asarray(x)


BASE_RTT = 0.0


def bench(fn, *args):
    fetch(fn(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fetch(fn(*args))
        best = min(best, time.time() - t0)
    return max(best - BASE_RTT, 1e-9) / ITERS


def rtt():
    """Median fetch round-trip on a trivial result (subtracted per chain)."""
    x = jnp.zeros((), jnp.float32)
    fetch(x + 1)
    ts = []
    for _ in range(7):
        t0 = time.time()
        fetch(x + 1)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    global BASE_RTT
    BASE_RTT = rtt()
    print(f"# tunnel RTT {BASE_RTT*1e3:.1f} ms (subtracted)", flush=True)
    bss = [int(a) for a in sys.argv[1:]] or [100, 500]
    windows = [int(w) for w in os.environ.get("EXP_WINDOW", "33,64").split(",")]
    b_tile = int(os.environ.get("EXP_BTILE", "0"))
    L = int(os.environ.get("EXP_LAYERS", "24"))  # distinct caches per step:
    # forces HBM streaming like the real 24-layer body (a single
    # loop-invariant cache gets pinned in VMEM and measures ~1.4 TB/s)
    for B in bss:
        for W in windows:
            ks = jax.random.split(jax.random.PRNGKey(0), 5)
            q0 = jax.random.normal(ks[0], (B, 1, C), jnp.float32).astype(DT)
            kn = jax.random.normal(ks[1], (B, 1, C), jnp.float32).astype(DT)
            vn = jax.random.normal(ks[2], (B, 1, C), jnp.float32).astype(DT)
            kcs = [
                jax.random.normal(k, (B, W, C), jnp.float32).astype(DT)
                for k in jax.random.split(ks[3], L)
            ]
            vcs = [
                jax.random.normal(k, (B, W, C), jnp.float32).astype(DT)
                for k in jax.random.split(ks[4], L)
            ]
            cur = jnp.int32(W - 1)
            gb = 2 * L * B * W * C * 2 / 1e9  # K+V bf16 read per step

            def chain_xla(q0, kn, vn, kcs, vcs, mode):
                def step(q, _):
                    for kc, vc in zip(kcs, vcs):
                        y = M._decode_attention_xla(
                            q, kn, vn, kc, vc, cur, NH, mode=mode
                        )
                        q = q + y.astype(DT) * jnp.bfloat16(1e-3)
                    return q, ()

                q, _ = jax.lax.scan(step, q0, None, length=ITERS)
                return q.sum()

            def chain_pallas(q0, kn, vn, kcs, vcs):
                kw = dict(n_head=NH)
                if b_tile:
                    kw["b_tile"] = b_tile

                def step(q, _):
                    for kc, vc in zip(kcs, vcs):
                        y = AK.decode_attention(
                            q[:, 0, :], kn[:, 0, :], vn[:, 0, :], kc, vc, cur, **kw
                        )
                        q = q + y[:, None, :].astype(DT) * jnp.bfloat16(1e-3)
                    return q, ()

                q, _ = jax.lax.scan(step, q0, None, length=ITERS)
                return q.sum()

            row = [f"B={B:4d} W={W:3d} x{L} ({gb*1e3:6.0f} MB/step)"]
            for mode in ("vpu", "mxu"):
                t = bench(
                    jax.jit(partial(chain_xla, mode=mode)), q0, kn, vn, kcs, vcs
                ) / L
                row.append(f"{mode} {t*1e6:7.1f}us ({gb/L/t:5.0f} GB/s)")
            try:
                t = bench(jax.jit(chain_pallas), q0, kn, vn, kcs, vcs) / L
                row.append(f"pallas {t*1e6:7.1f}us ({gb/L/t:5.0f} GB/s)")
            except Exception as e:  # Mosaic errors etc.
                row.append(f"pallas FAIL: {type(e).__name__}: {str(e)[:160]}")
            print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
