"""CLIP score: cosine(ViT-B/32 image emb, text emb), order-aligned with the
text dataset (reference /root/reference/rqvae/metrics/clip_score.py:28-90).

Runs CLIP via HuggingFace's Flax port. The reference downloads openai
ViT-B/32 at call time; with zero egress, point RQVAE_TPU_CLIP_DIR at a local
copy of openai/clip-vit-base-patch32 (flax or torch weights + tokenizer). An
informative error is raised when no weights are available.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_clip(model_dir: Optional[str] = None):
    model_dir = model_dir or os.environ.get("RQVAE_TPU_CLIP_DIR")
    if not model_dir or not os.path.isdir(model_dir):
        raise FileNotFoundError(
            "CLIP weights unavailable (zero-egress environment). Set "
            "RQVAE_TPU_CLIP_DIR to a local openai/clip-vit-base-patch32 "
            "checkout (config.json + weights + tokenizer files)."
        )
    from transformers import CLIPProcessor, FlaxCLIPModel

    model = FlaxCLIPModel.from_pretrained(model_dir, from_pt=not any(
        f.endswith((".msgpack", ".safetensors")) and "flax" in f
        for f in os.listdir(model_dir)
    ))
    processor = CLIPProcessor.from_pretrained(model_dir)
    return model, processor


def clip_score(pixels01: np.ndarray, texts, model, processor) -> np.ndarray:
    """pixels01: [B,H,W,3] (or NCHW) in [0,1]; texts: list[str] -> [B]."""
    if pixels01.ndim == 4 and pixels01.shape[1] == 3 and pixels01.shape[-1] != 3:
        pixels01 = np.transpose(pixels01, (0, 2, 3, 1))
    from PIL import Image

    images = [Image.fromarray((p * 255).astype(np.uint8)) for p in pixels01]
    inputs = processor(
        text=list(texts), images=images, return_tensors="np",
        padding="max_length", truncation=True, max_length=77,
    )
    out = model(**inputs)
    img = np.asarray(out.image_embeds)
    txt = np.asarray(out.text_embeds)
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    return (img * txt).sum(-1)


def compute_clip_score(
    fake_path: str,
    dataset_name: str = "cc3m",
    dataset_root: Optional[str] = None,
    split: str = "val",
    batch_size: int = 100,
    model_dir: Optional[str] = None,
) -> float:
    from rqvae_tpu.data.textimg import Cc3mRawTextOnly, CocoRawTextOnly
    from rqvae_tpu.metrics.fid import load_samples_from_files

    model, processor = load_clip(model_dir)
    samples = load_samples_from_files(fake_path)

    if dataset_name == "cc3m":
        txt_dataset = Cc3mRawTextOnly(dataset_root or "data/cc3m", split=split)
    elif dataset_name == "coco":
        txt_dataset = CocoRawTextOnly(dataset_root or "data/coco", split=split)
    else:
        raise ValueError(f"Unsupported dataset: {dataset_name}")

    # sample order matches text order; drop distributed-sampler duplicates
    assert len(samples) >= len(txt_dataset)
    n = len(txt_dataset)
    scores = []
    for i in range(0, n, batch_size):
        j = min(i + batch_size, n)
        pix = samples[i:j]
        txts = [txt_dataset[k] for k in range(i, j)]
        scores.append(clip_score(pix, txts, model, processor))
    return float(np.concatenate(scores).mean())
