"""A/B the wo-folded attention kernel (DecodePolicy.attn_wo) on the full
1.4B AR sampler — VERDICT r4 item 1c (one custom-call boundary reduction
per layer: attention + output projection + residual + LN2 in ONE call,
ops/attention_kernel.py::decode_attention_q8_update_wo).

Requires kv_q8 (the fold lives in the q8 fused-write kernel). Run:

  EXP_BS=100 EXP_INT8=1 python tools/exp_attn_wo.py

Env: EXP_BS / EXP_ITERS / EXP_INT8 / EXP_MODEL as in exp_r2_ar.py.
"""

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["RQVAE_TPU_KV_Q8"] = "1"

import jax.numpy as jnp  # noqa: E402

from tools.exp_r2_ar import BS, ITERS, build, fetch  # noqa: E402
from rqvae_tpu.models.rqtransformer import sampling as S  # noqa: E402


def main():
    tconf, params, vq_state, vq_config = build()
    cond = jnp.zeros((BS,), jnp.int32)

    def sample_fn(key):
        return S.sample(
            params, tconf, key, BS, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=1.0, top_k=None, top_p=None, dtype=jnp.bfloat16,
        )

    for wo in ("0", "1"):
        os.environ["RQVAE_TPU_ATTN_WO"] = wo
        t0 = time.time()
        fetch(sample_fn(jax.random.PRNGKey(99)).sum())
        print(f"# attn_wo={wo} compile+run: {time.time()-t0:.1f} s", flush=True)
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            outs = [sample_fn(jax.random.PRNGKey(rep * 100 + i)) for i in range(ITERS)]
            fetch(sum(o.sum() for o in outs))
            best = min(best, (time.time() - t0) / (ITERS * BS) * 1000)
        print(f"# AR full sampler attn_wo={wo}: {best:.3f} ms/sample (bs{BS})",
              flush=True)


if __name__ == "__main__":
    main()
