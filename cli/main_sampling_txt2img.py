"""Text-to-image sampling over cc3m/coco caption sets.

Mirror of /root/reference/main_sampling_txt2img.py:77-212: text conds come
from the Cc3mTextOnly / CocoTextOnly datasets in order, samples are dumped as
samples_*.pkl in dataset order for CLIP-score / FID evaluation.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

from common import load_ar_and_vqvae, set_seed

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.data.textimg import Cc3mTextOnly, CocoTextOnly
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqvae.model import RQVAE


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", type=str, required=True)
    p.add_argument("-o", "--out-dir", type=str, default="")
    p.add_argument("-d", "--dataset", type=str, default="cc3m", choices=["cc3m", "coco"])
    p.add_argument("--dataset-root", type=str, default="")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("-bs", "--batch-size", type=int, default=100)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true", help="sample with EMA weights")
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

    root = args.dataset_root or f"data/{args.dataset}"
    ds_cls = Cc3mTextOnly if args.dataset == "cc3m" else CocoTextOnly
    txt_dataset = ds_cls(
        root, args.split,
        tok_name=config.dataset.txt_tok_name,
        transform=None,
        context_length=config.dataset.context_length,
    )
    logging.info("#text conds: %d", len(txt_dataset))

    top_k = args.top_k if args.top_k > 0 else None
    top_p = args.top_p if args.top_p > 0 else None
    out_dir = args.out_dir or os.path.join(
        os.path.dirname(args.model_path),
        f"{args.dataset}_{args.split}_temp{args.temp}_top_k_{top_k}_top_p_{top_p}",
    )
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def decode(codes):
        pix = vqvae.apply(vq_vars, codes, method=RQVAE.decode_code)
        return jnp.clip(pix * 0.5 + 0.5, 0.0, 1.0)

    rng = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    n = len(txt_dataset)
    num_batches = (n + bs - 1) // bs
    for batch_idx in range(num_batches):
        idxs = [min(i, n - 1) for i in range(batch_idx * bs, (batch_idx + 1) * bs)]
        conds = np.stack([np.asarray(txt_dataset[i][1]) for i in idxs])
        rng, sub = jax.random.split(rng)
        codes = S.sample(
            ar_params, tconf, sub, bs, cond=jnp.asarray(conds),
            vq_state=vq_state, vq_config=vq_config,
            temperature=args.temp, top_k=top_k, top_p=top_p,
        )
        pixels = np.asarray(decode(codes))
        with open(os.path.join(out_dir, f"samples_{batch_idx:05d}.pkl"), "wb") as f:
            pickle.dump(np.transpose(pixels, (0, 3, 1, 2)).astype(np.float32), f)
        logging.info("batch %d/%d", batch_idx + 1, num_batches)
        if smoke:
            break
    logging.info("samples saved under %s", out_dir)


if __name__ == "__main__":
    main()
