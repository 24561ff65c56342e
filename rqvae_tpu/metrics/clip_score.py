"""CLIP score: cosine(ViT-B/32 image emb, text emb), order-aligned with the
text dataset (reference /root/reference/rqvae/metrics/clip_score.py:28-90).

Runs the repo-native JAX CLIP (metrics/clip_model.py) — numeric parity vs an
executed torch CLIPModel is pinned in tests/test_eval_parity.py. Weights are
converted at load time from either public torch layout (OpenAI ViT-B-32.pt
or HuggingFace openai/clip-vit-base-patch32); with zero egress, point
RQVAE_TPU_CLIP_DIR at a local copy. torch is only used to deserialize the
checkpoint — inference is pure JAX on TPU.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax

from rqvae_tpu.metrics import clip_model as C


class CLIPScorer:
    """Converted params + config + tokenizer, with a jitted score fn."""

    def __init__(self, params, config: C.CLIPConfig, tokenizer):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self._score = jax.jit(
            lambda pixels, tokens: C.clip_scores(params, config, pixels, tokens)
        )

    def tokenize(self, texts) -> np.ndarray:
        """clip.tokenize semantics: [sot] + bpe + [eot], zero-padded to the
        context length; on truncation the last slot stays the eot token (it
        is also the argmax-pooling anchor)."""
        L = self.config.context_length
        self.tokenizer.enable_truncation(L)
        self.tokenizer.enable_padding(L, pad_id=0)
        out = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            ids = self.tokenizer.encode(t).ids
            if ids[L - 1] not in (0, self.tokenizer.eot):
                ids[L - 1] = self.tokenizer.eot
            out[i] = ids
        return out

    def __call__(self, pixels01: np.ndarray, texts) -> np.ndarray:
        """pixels01: [B,H,W,3] (or NCHW) in [0,1]; texts: list[str] -> [B]."""
        if (
            pixels01.ndim == 4
            and pixels01.shape[1] == 3
            and pixels01.shape[-1] != 3
        ):
            pixels01 = np.transpose(pixels01, (0, 2, 3, 1))
        pixels = C.preprocess_images(
            np.asarray(pixels01), self.config.image_size
        )
        return np.asarray(self._score(pixels, self.tokenize(texts)))


def load_clip(model_dir: Optional[str] = None) -> CLIPScorer:
    model_dir = model_dir or os.environ.get("RQVAE_TPU_CLIP_DIR")
    if not model_dir or not os.path.isdir(model_dir):
        raise FileNotFoundError(
            "CLIP weights unavailable (zero-egress environment). Set "
            "RQVAE_TPU_CLIP_DIR to a local ViT-B/32 checkpoint dir — either "
            "the OpenAI ViT-B-32.pt or a HuggingFace "
            "openai/clip-vit-base-patch32 checkout (torch weights + the "
            "bpe_simple_vocab_16e6.txt.gz merges file)."
        )
    sd = _load_state_dict(model_dir)
    params, config = C.convert_torch_clip(sd)

    from rqvae_tpu.data.clip_tokenizer import SimpleTokenizer

    vocab = os.path.join(model_dir, "bpe_simple_vocab_16e6.txt.gz")
    tokenizer = SimpleTokenizer(bpe_path=vocab if os.path.exists(vocab) else None)
    return CLIPScorer(params, config, tokenizer)


def _load_state_dict(model_dir: str):
    import torch

    for name in sorted(os.listdir(model_dir)):
        path = os.path.join(model_dir, name)
        if name.endswith(".safetensors"):
            from safetensors.torch import load_file

            return load_file(path)
        if name.endswith((".pt", ".bin", ".pth")):
            try:
                obj = torch.load(path, map_location="cpu", weights_only=True)
            except Exception:
                # the published OpenAI ViT-B-32.pt is a TorchScript archive
                obj = torch.jit.load(path, map_location="cpu").state_dict()
            if hasattr(obj, "state_dict"):
                obj = obj.state_dict()
            if isinstance(obj, dict) and "state_dict" in obj:
                obj = obj["state_dict"]
            return obj
    raise FileNotFoundError(f"no torch weights (*.pt/*.bin/*.safetensors) in {model_dir}")


def clip_score(pixels01: np.ndarray, texts, scorer: CLIPScorer) -> np.ndarray:
    """pixels01 in [0,1] + texts -> per-pair cosine scores (reference
    clip_score.py:34-47)."""
    return scorer(pixels01, texts)


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

    scorer = load_clip(model_dir)
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
        scores.append(scorer(pix, txts))
    return float(np.concatenate(scores).mean())
