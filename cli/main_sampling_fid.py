"""Class-conditional sampling + FID/IS evaluation.

Mirror of /root/reference/main_sampling_fid.py:161-268: sample n_samples
images across the label set with the stage-2 transformer, decode with the
stage-1 RQ-VAE, dump samples_*.pkl (NCHW float [0,1], artifact-compatible),
then compute FID (vs precomputed stats npz) and IS. TPU-side: sampling is one
jitted scan per batch and decode is batched (the reference decodes
per-sample, main_sampling_fid.py:223).

Usage:
  python cli/main_sampling_fid.py -m <stage2 ckpt .pt/orbax> \
      --temp 1.0 --top-k 0 --top-p 0.92 -bs 100 -n 50000 \
      [--stats <fid_stats.npz>]
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
import time

from common import load_ar_and_vqvae, set_seed

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.metrics import fid as fid_lib
from rqvae_tpu.metrics import is_score as is_lib
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqvae.model import RQVAE


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", type=str, required=True)
    p.add_argument("-o", "--out-dir", type=str, default="")
    p.add_argument("-n", "--n-samples", type=int, default=50000)
    p.add_argument("-bs", "--batch-size", type=int, default=100)
    p.add_argument("--n-labels", type=int, default=0, help="0 = from config")
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0, help="0 = no top-k")
    p.add_argument("--top-p", type=float, default=0.0, help="0 = no top-p")
    p.add_argument("--stats", type=str, default="", help="reference FID stats npz")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true", help="sample with EMA weights")
    p.add_argument("--no-metrics", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    set_seed(args.seed)
    from rqvae_tpu.utils.config import env_flag
    smoke = env_flag("SMOKE_TEST")

    tconf, ar_params, vqvae, vq_vars, config = load_ar_and_vqvae(args.model_path, use_ema=args.ema)
    vq_state = vq_vars["codebook"]["state"]
    vq_config = vqvae.quantizer_config

    n_labels = args.n_labels or max(tconf.vocab_size_cond, 1)
    assert args.n_samples % args.batch_size == 0 or smoke
    num_batches = max(args.n_samples // args.batch_size, 1)

    top_k = args.top_k if args.top_k > 0 else None
    top_p = args.top_p if args.top_p > 0 else None

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(args.model_path),
        f"samples_temp{args.temp}_top_k_{top_k}_top_p_{top_p}",
    )
    os.makedirs(out_dir, exist_ok=True)
    # seed provenance (reference saves per-rank seeds, main_sampling_fid.py:99-138)
    with open(os.path.join(out_dir, "seeds.txt"), "a") as f:
        f.write(f"seed={args.seed} n={args.n_samples} bs={args.batch_size}\n")

    @jax.jit
    def decode(codes):
        pix = vqvae.apply(vq_vars, codes, method=RQVAE.decode_code)
        return jnp.clip(pix * 0.5 + 0.5, 0.0, 1.0)

    rng = jax.random.PRNGKey(args.seed)
    # cond layout: labels arranged round-robin like the reference's
    # arange(n_labels).repeat_interleave (main_sampling_fid.py:196-197)
    all_conds = np.repeat(
        np.arange(n_labels), max(args.n_samples // n_labels, 1)
    )[: num_batches * args.batch_size]
    if len(all_conds) < num_batches * args.batch_size:
        all_conds = np.resize(all_conds, num_batches * args.batch_size)

    t0 = time.time()
    for batch_idx in range(num_batches):
        rng, sub = jax.random.split(rng)
        cond = jnp.asarray(
            all_conds[batch_idx * args.batch_size : (batch_idx + 1) * args.batch_size],
            jnp.int32,
        )
        codes = S.sample(
            ar_params, tconf, sub, args.batch_size, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=args.temp, top_k=top_k, top_p=top_p,
        )
        pixels = np.asarray(decode(codes))  # NHWC [0,1]
        pixels_nchw = np.transpose(pixels, (0, 3, 1, 2))  # reference layout
        with open(os.path.join(out_dir, f"samples_{batch_idx}.pkl"), "wb") as f:
            pickle.dump(pixels_nchw.astype(np.float32), f)
        np.savez(
            os.path.join(out_dir, f"targets_{batch_idx}.npz"),
            targets=np.asarray(cond),
        )
        done = (batch_idx + 1) * args.batch_size
        logging.info(
            "batch %d/%d (%.1f ms/sample)",
            batch_idx + 1, num_batches, (time.time() - t0) / done * 1000,
        )
        if smoke:
            break

    if args.no_metrics:
        return
    extractor = fid_lib.InceptionExtractor()
    mu, sigma, acts = fid_lib.compute_statistics_from_files(
        out_dir, extractor=extractor, return_acts=True
    )
    np.savez(os.path.join(out_dir, "acts.npz"), acts=acts, mu=mu, sigma=sigma)
    m_is, s_is = is_lib.compute_inception_score_from_files(out_dir, extractor=extractor)
    logging.info("IS: %.4f +- %.4f", m_is, s_is)
    if args.stats:
        d = fid_lib.compute_fid(out_dir, args.stats)
        logging.info("FID: %.4f", d)


if __name__ == "__main__":
    main()
