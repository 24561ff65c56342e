"""Sampling throughput benchmark (reference measure_throughput/__main__.py).

Builds an RQ-VAE (f32/f16/f8 geometry) + RQ-Transformer
(huge/large/medium/small) from the same model zoo as the reference
(:30-230) and times AR sampling + decode per sample over n_loop loops.

Usage: python cli/measure_throughput.py f=32 model=huge d=4 c=16384 batch_size=100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.models import create_rqvae
from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.models.rqvae.model import RQVAE
from rqvae_tpu.utils.config import Config, augment_arch_defaults

DTYPE = jnp.bfloat16

RQVAE_GEOM = {  # f -> (latent hw, ch_mult, attn res)  (reference rq_defaults.yaml)
    32: (8, [1, 1, 2, 2, 4, 4], 8),
    16: (16, [1, 1, 2, 2, 4], 16),
    8: (32, [1, 2, 2, 4], 32),
}

TRANSFORMERS = {  # model -> (embed_dim, body_d>1, head_d>1, body_d1, n_head)
    # reference-exact zoo (measure_throughput/__main__.py:69-211)
    "huge": (1536, 42, 6, 48, 24),    # 1400M (:70-92)
    "large": (1536, 24, 4, 28, 24),   # 800M  (:94-116)
    "medium": (1024, 24, 4, 28, 16),  # 350M  (:118-140)
    "small": (512, 24, 4, 28, 8),     # 90M   (:142-164)
    # the cc3m text-conditional 650M (configs/cc3m/cc3m-rqtransformer-
    # 8x8x4-650M.yaml): embed 1280, body 26, head 4, nh 20; pair with
    # cond_len=32 vocab_cond=16384 for the real text geometry
    "650M": (1280, 26, 4, 26, 20),
}

# named VQGAN baselines (reference :166-211): body-only stacks pinned to an
# exact f16-d1 geometry — (embed_dim, body_n_layer, n_head, f, codebook)
VQGAN_TRANSFORMERS = {
    "vqgan_large": (1664, 24, 16, 16, 1024),   # 800M,  f16-d1-c1024
    "vqgan_huge": (1536, 48, 24, 16, 16384),   # 1400M, f16-d1-c16384
}


def build(f, model_name, depth, codebook_size, cond_len=1, vocab_cond=1000):
    hw, ch_mult, attn_res = RQVAE_GEOM[f]
    arch_vq = dict(
        type="rq-vae",
        hparams=dict(
            bottleneck_type="rq", embed_dim=256, n_embed=codebook_size,
            latent_shape=[hw, hw, 256], code_shape=[hw, hw, depth],
            shared_codebook=True, decay=0.99, restart_unused_codes=True,
            loss_type="mse", latent_loss_weight=0.25,
        ),
        ddconfig=dict(
            double_z=False, z_channels=256, resolution=256, in_channels=3,
            out_ch=3, ch=128, ch_mult=ch_mult, num_res_blocks=2,
            attn_resolutions=[attn_res], dropout=0.0,
        ),
    )
    vqvae = create_rqvae(arch_vq)

    if model_name in VQGAN_TRANSFORMERS:
        embed_dim, body_l_d1, n_head, f_req, c_req = VQGAN_TRANSFORMERS[model_name]
        if f != f_req or depth != 1 or codebook_size != c_req:
            raise ValueError(
                f"{model_name} only works with f{f_req}-d1-c{c_req} "
                f"(reference measure_throughput/__main__.py:173,196)"
            )
        body_l, head_l = body_l_d1, 0
    else:
        embed_dim, body_l, head_l, body_l_d1, n_head = TRANSFORMERS[model_name]
    arch_t = dict(
        type="rq-transformer",
        vocab_size=codebook_size,
        block_size=[hw, hw, depth],
        embed_dim=embed_dim,
        input_embed_dim=256,
        shared_tok_emb=True, shared_cls_emb=True,
        input_emb_vqvae=True, head_emb_vqvae=True, cumsum_depth_ctx=True,
        vocab_size_cond=vocab_cond, block_size_cond=cond_len,
        body={"n_layer": body_l if depth > 1 else body_l_d1,
              "block": {"n_head": n_head}},
        head={"n_layer": head_l if depth > 1 else 0, "block": {"n_head": n_head}},
    )
    tconf = TransformerConfig.create(augment_arch_defaults(Config(arch_t)).to_dict())
    return vqvae, tconf


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    f = int(kv.get("f", 32))
    model_name = kv.get("model", "huge")
    depth = int(kv.get("d", 4))
    codebook_size = int(kv.get("c", 16384))
    batch_size = int(kv.get("batch_size", 50))
    n_loop = int(kv.get("n_loop", 6))
    warmup = int(kv.get("warmup", 1))
    samples_per_loop = int(kv.get("samples_per_loop", 1000))
    # text-conditional geometry (main_sampling_txt2img.py:77-118): a
    # cond_len-token prompt prefix prefills the body, lengthening its
    # sequence to cond_len + H*W
    cond_len = int(kv.get("cond_len", 1))
    vocab_cond = int(kv.get("vocab_cond", 16384 if cond_len > 1 else 1000))
    top_p = float(kv["top_p"]) if "top_p" in kv else None

    vqvae, tconf = build(f, model_name, depth, codebook_size, cond_len, vocab_cond)

    @jax.jit
    def init_all(k1, k2, k3):
        x0 = jnp.zeros((1, 256, 256, 3), DTYPE)
        vq_vars = vqvae.init({"params": k1, "quantizer": k2}, x0)
        vq_vars = jax.tree.map(
            lambda x: x.astype(DTYPE) if x.dtype == jnp.float32 else x, vq_vars
        )
        params = jax.tree.map(
            lambda x: x.astype(DTYPE), M.init_transformer_params(k3, tconf)
        )
        return vq_vars, params

    vq_vars, params = init_all(*jax.random.split(jax.random.PRNGKey(0), 3))
    # int8=1: weight-only int8 serving quantization for the transformer
    # (models/rqtransformer/model.py::quantize_transformer_params); pair
    # with RQVAE_TPU_KV_Q8=1 for the full int8 serving operating point
    if kv.get("int8") in ("1", "true", "yes"):
        params = jax.jit(M.quantize_transformer_params)(params)
        print("int8 weight-only quantization ON")
    vq_state = vq_vars["codebook"]["state"]
    vq_config = vqvae.quantizer_config

    n_ar = sum(p.size for p in jax.tree.leaves(params))
    n_vq = sum(p.size for p in jax.tree.leaves(vq_vars["params"]))
    title = f"f{f}-{model_name}-d{depth}-c{codebook_size}-bs{batch_size}"
    if cond_len > 1:
        title += f"-cond{cond_len}"
    print(f"{title} | backend {jax.default_backend()}")
    print(f"rqvae size: {n_vq/1e6:.1f}M, rqtransformer size: {n_ar/1e6:.1f}M")

    if cond_len > 1:
        cond = jnp.zeros((batch_size, cond_len), jnp.int32)
    else:
        cond = jnp.zeros((batch_size,), jnp.int32)

    def sample_fn(key):
        return S.sample(
            params, tconf, key, batch_size, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=1.0, top_k=None, top_p=top_p, dtype=DTYPE,
        )

    # decode in <=100-image chunks (100 fits v5e HBM at 256x256 alongside
    # the 1.4B transformer; chunking only kicks in for larger batches)
    chunk = max(1, batch_size // max(1, batch_size // 100))

    @jax.jit
    def decode_fn(codes):
        n_chunks = max(1, codes.shape[0] // chunk)
        chunks = codes.reshape(n_chunks, -1, *codes.shape[1:])
        pix = jax.lax.map(
            lambda c: jnp.clip(
                0.5 * vqvae.apply(vq_vars, c, method=RQVAE.decode_code) + 0.5, 0, 1
            ),
            chunks,
        )
        return pix.reshape(-1, *pix.shape[2:])

    n_iter = max(1, samples_per_loop // batch_size)
    speeds = []
    for loop_idx in range(n_loop):
        t_ar = t_dec = 0.0
        t0 = time.time()
        for i in range(n_iter):
            ta = time.time()
            codes = sample_fn(jax.random.PRNGKey(loop_idx * 1000 + i))
            _ = np.asarray(codes.sum())  # force completion (tunnel-safe)
            tb = time.time()
            pix = decode_fn(codes)
            _ = np.asarray(pix[:, ::64, ::64].mean())
            tc = time.time()
            t_ar += tb - ta
            t_dec += tc - tb
        dt = time.time() - t0
        speed = dt / (n_iter * batch_size) * 1000
        print(
            f"{loop_idx+1}/{n_loop} | {speed:.1f} ms/sample "
            f"(ar: {t_ar/(n_iter*batch_size)*1000:.1f}, "
            f"decode: {t_dec/(n_iter*batch_size)*1000:.1f})"
        )
        if loop_idx >= warmup:
            speeds.append(speed)
    print("-" * 80)
    print(f"{title} | {sum(speeds)/len(speeds):.4f} ms/sample")


if __name__ == "__main__":
    main()
