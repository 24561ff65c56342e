"""Pin the Pallas-vs-MXU decode-attention crossover with measurements.

VERDICT r2 weak #8: the dispatch threshold (batch 300 in
model.resolve_attn_backend) was interpolated from bs200 (XLA/MXU wins) and
bs500 (Pallas wins). This measures AR-only ms/sample for both backends at
the batches in between on the 1.4B sampler.

Usage:  python tools/exp_attn_crossover.py [bs ...]   (default 250 300 400)
"""

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S


def measure(bs: int, attn: str, params, tconf, vq_state, vq_config, dtype):
    policy = M.decode_policy_from_env()._replace(attn=attn)
    cond = jax.numpy.zeros((bs,), jax.numpy.int32)

    def sample_fn(key):
        return S.sample(
            params, tconf, key, bs, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=1.0, top_k=None, top_p=None, dtype=dtype,
            policy=policy,
        )

    t0 = time.time()
    np.asarray(sample_fn(jax.random.PRNGKey(0)).sum())
    print(f"#   bs{bs} {attn}: compile+run {time.time()-t0:.1f} s", flush=True)
    n_iters = max(1, 1000 // bs)
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        outs = [sample_fn(jax.random.PRNGKey(100 * rep + i)) for i in range(n_iters)]
        np.asarray(sum(o.sum() for o in outs))
        best = min(best, (time.time() - t0) / (n_iters * bs) * 1000)
    print(f"bs{bs:4d} attn={attn:6s}: AR {best:6.2f} ms/sample", flush=True)
    return best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [250, 300, 400]
    tconf, params, vqvae, vq_vars = bench.build_models()
    vq_config = vqvae.quantizer_config
    vq_state = vq_vars["codebook"]["state"]
    results = {}
    for bs in batches:
        for attn in ("mxu", "pallas"):
            results[(bs, attn)] = measure(
                bs, attn, params, tconf, vq_state, vq_config, bench.DTYPE
            )
    for bs in batches:
        m, p = results[(bs, "mxu")], results[(bs, "pallas")]
        print(
            f"bs{bs:4d}: mxu {m:6.2f}  pallas {p:6.2f}  "
            f"-> {'pallas' if p < m else 'mxu'} wins by {abs(m-p)/max(m,p)*100:.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
