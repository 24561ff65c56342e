"""Interactive text-to-image helpers (reference
/root/reference/notebooks/notebook_utils.py:31-137): TextEncoder, model
loading from a ckpt dir, and `get_generated_images_by_texts` — sample N
images for a prompt, decode, re-rank by CLIP score descending."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.data.tokenizers import create_tokenizer, prepare_tokenizer
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqvae.model import RQVAE


class TextEncoder:
    def __init__(self, tokenizer_name: str, context_length: int = 64, lowercase=True):
        self.tokenizer = prepare_tokenizer(
            create_tokenizer(tokenizer_name, lowercase=lowercase), context_length
        )
        self.context_length = context_length

    def encode(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text).ids, np.int32)

    def __call__(self, text: str) -> np.ndarray:
        return self.encode(text)


def get_generated_images_by_texts(
    ar_params,
    tconf,
    vqvae: RQVAE,
    vq_vars: dict,
    text_encoder: TextEncoder,
    text_prompt: str,
    num_samples: int,
    temperature: float,
    top_k,
    top_p,
    rng: Optional[jax.Array] = None,
    clip_scorer=None,  # metrics.clip_score.CLIPScorer
):
    """Returns pixels [num_samples, H, W, 3] in [0,1], CLIP-reranked
    descending when a CLIP model is given (notebook_utils.py:128-136)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cond = jnp.asarray(np.tile(text_encoder(text_prompt), (num_samples, 1)))

    codes = S.sample(
        ar_params, tconf, rng, num_samples, cond=cond,
        vq_state=vq_vars["codebook"]["state"],
        vq_config=vqvae.quantizer_config,
        temperature=temperature, top_k=top_k, top_p=top_p,
    )
    pixels = vqvae.apply(vq_vars, codes, method=RQVAE.decode_code)
    pixels = np.asarray(jnp.clip(pixels * 0.5 + 0.5, 0.0, 1.0))

    if clip_scorer is not None:
        scores = clip_scorer(pixels, [text_prompt] * num_samples)
        order = np.argsort(-scores)
        pixels = pixels[order]
    return pixels
