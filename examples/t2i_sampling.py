"""Text-to-image sampling example (script equivalent of the reference
notebooks/T2I_sampling.ipynb): load the 3.9B T2I checkpoint pair, sample N
images for a prompt, CLIP-rerank, save a grid.

  python examples/t2i_sampling.py -m <stage2 ckpt> \
      --prompt "a painting of a tree on the ocean" -n 16 \
      --top-k 1024 --top-p 0.95
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "cli"))

import numpy as np
from PIL import Image

import jax

from common import load_ar_and_vqvae
from rqvae_tpu.notebooks.notebook_utils import TextEncoder, get_generated_images_by_texts
from rqvae_tpu.utils.setup import make_grid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", required=True)
    p.add_argument("--prompt", default="a painting of a tree on the ocean")
    p.add_argument("-n", "--num-samples", type=int, default=16)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=1024)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--out", default="t2i_samples.png")
    args = p.parse_args()

    tconf, ar_params, vqvae, vq_vars, config = load_ar_and_vqvae(args.model_path)
    text_encoder = TextEncoder(
        config.dataset.txt_tok_name, context_length=config.dataset.context_length
    )

    clip_scorer = None
    try:
        from rqvae_tpu.metrics.clip_score import load_clip

        clip_scorer = load_clip()
    except FileNotFoundError as e:
        print(f"(no CLIP re-ranking: {e})")

    pixels = get_generated_images_by_texts(
        ar_params, tconf, vqvae, vq_vars, text_encoder, args.prompt,
        args.num_samples, args.temp, args.top_k, args.top_p,
        rng=jax.random.PRNGKey(args.seed),
        clip_scorer=clip_scorer,
    )
    grid = make_grid(pixels, nrow=int(np.ceil(np.sqrt(args.num_samples))))
    Image.fromarray((grid * 255).astype(np.uint8)).save(args.out)
    print(f"saved {args.num_samples} samples for {args.prompt!r} -> {args.out}")


if __name__ == "__main__":
    main()
