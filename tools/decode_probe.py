"""Decode-path probe: time + trace the RQ-VAE 256px decoder at bench shapes.

Usage: python tools/decode_probe.py [--trace]
Env:   PROBE_BS (default 100)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from rqvae_tpu.models.rqvae.model import RQVAE

BS = int(os.environ.get("PROBE_BS", "100"))
bench.BATCH_SIZE = BS


def fetch(x):
    return np.asarray(x)


def main():
    tconf, params, vqvae, vq_vars = bench.build_models()
    codes = jnp.zeros((BS, 8, 8, 4), jnp.int32)

    @jax.jit
    def decode_fn(codes):
        pix = vqvae.apply(vq_vars, codes, method=RQVAE.decode_code)
        return jnp.clip(0.5 * pix + 0.5, 0.0, 1.0)

    t0 = time.time()
    fetch(decode_fn(codes)[:, ::64, ::64].mean())
    print(f"# decode compile+run: {time.time()-t0:.1f} s", flush=True)

    best = 1e9
    for _ in range(4):
        t0 = time.time()
        fetch(decode_fn(codes)[:, ::64, ::64].mean())
        best = min(best, time.time() - t0)
    print(f"# decode-only: {best*1000:.1f} ms ({best/BS*1000:.3f} ms/sample)", flush=True)

    if "--trace" in sys.argv:
        os.makedirs("/tmp/jax_trace_decode", exist_ok=True)
        with jax.profiler.trace("/tmp/jax_trace_decode"):
            fetch(decode_fn(codes)[:, ::64, ::64].mean())
        print("# trace written to /tmp/jax_trace_decode", flush=True)


if __name__ == "__main__":
    main()
