"""Full 1.4B AR sampler timing with a lightweight synthetic codebook —
skips the RQ-VAE conv init so XLA-flag experiments iterate fast.

The full sampler interleaves body and depth-head work in one scan step;
isolated components (tools/exp_r2_body.py, perf_probe.py) measured
body 3.99 + head/cls/sample ~1.1 ms/sample at bs100 while the full AR pass
runs 6.28 — ~1.2 ms/sample of interleave loss. This harness measures the
full pass under different XLA scheduler/VMEM flags:

  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" EXP_BS=100 \
      python tools/exp_r2_ar.py

Env: EXP_BS (default 100), EXP_ITERS (default 4), plus the sampler's own
RQVAE_TPU_SAMPLE_PHASES / RQVAE_TPU_SAMPLE_UNROLL knobs.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq
from rqvae_tpu.utils.config import Config, augment_arch_defaults

BS = int(os.environ.get("EXP_BS", "100"))
ITERS = int(os.environ.get("EXP_ITERS", "4"))
INT8 = bool(os.environ.get("EXP_INT8"))
# EXP_MODEL: 1400M (default, the throughput 'huge') or 3800M (the
# reference flagship, configs/imagenet256/stage2/*3800M.yaml geometry)
MODEL = os.environ.get("EXP_MODEL", "1400M").strip()
MODEL_GEOM = {"1400M": (1536, 42, 6, 24), "3800M": (2560, 42, 6, 40)}
DTYPE = jnp.bfloat16


def fetch(x):
    return np.asarray(x)


def build():
    embed_dim, n_body, n_head_layers, n_head = MODEL_GEOM[MODEL]
    arch = dict(
        type="rq-transformer",
        vocab_size=16384,
        block_size=[8, 8, 4],
        embed_dim=embed_dim,
        input_embed_dim=256,
        shared_tok_emb=True,
        shared_cls_emb=True,
        input_emb_vqvae=True,
        head_emb_vqvae=True,
        cumsum_depth_ctx=True,
        vocab_size_cond=1000,
        block_size_cond=1,
        body={"n_layer": n_body, "block": {"n_head": n_head}},
        head={"n_layer": n_head_layers, "block": {"n_head": n_head}},
    )
    tconf = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())

    @jax.jit
    def _init(key):
        p = M.init_transformer_params(key, tconf)
        return jax.tree.map(lambda x: x.astype(DTYPE), p)

    params = _init(jax.random.PRNGKey(0))
    if INT8:
        params = jax.jit(M.quantize_transformer_params)(params)
        print("# int8 weight-only quantization ON", flush=True)
    fetch(jax.tree.leaves(params)[0].sum())

    vq_config = rq.QuantizerConfig(
        latent_shape=(8, 8, 256),
        code_shape=(8, 8, 4),
        n_embed=(16384,) * 4,
        decay=(0.99,) * 4,
        shared_codebook=True,
    )
    k = jax.random.PRNGKey(7)
    vq_state = rq.CodebookState(
        embed=jax.random.normal(k, (1, 16384, 256), DTYPE) * 0.02,
        cluster_size=jnp.zeros((1, 16384), jnp.float32),
        embed_ema=jnp.zeros((1, 16384, 256), jnp.float32),
    )
    return tconf, params, vq_state, vq_config


def main():
    tconf, params, vq_state, vq_config = build()
    flags = os.environ.get("XLA_FLAGS", "")
    print(f"# backend {jax.default_backend()}, model {MODEL}, bs {BS}, XLA_FLAGS={flags!r}", flush=True)
    cond = jnp.zeros((BS,), jnp.int32)

    def sample_fn(key):
        return S.sample(
            params, tconf, key, BS, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=1.0, top_k=None, top_p=None, dtype=DTYPE,
        )

    t0 = time.time()
    fetch(sample_fn(jax.random.PRNGKey(99)).sum())
    print(f"# compile+run: {time.time()-t0:.1f} s", flush=True)

    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        outs = [sample_fn(jax.random.PRNGKey(rep * 100 + i)) for i in range(ITERS)]
        fetch(sum(o.sum() for o in outs))
        best = min(best, (time.time() - t0) / (ITERS * BS) * 1000)
    print(f"# AR full sampler: {best:.3f} ms/sample (bs{BS})", flush=True)

    if "--trace" in sys.argv:
        os.makedirs("/tmp/jax_trace_ar", exist_ok=True)
        with jax.profiler.trace("/tmp/jax_trace_ar"):
            outs = [sample_fn(jax.random.PRNGKey(999 + i)) for i in range(2)]
            fetch(sum(o.sum() for o in outs))
        print("# trace written to /tmp/jax_trace_ar", flush=True)


if __name__ == "__main__":
    main()
