"""Text tokenizer registry.

Mirrors the reference registry
(/root/reference/rqvae/txtimg_datasets/tokenizers/__init__.py:24-47): CLIP
SimpleTokenizer BPE plus HuggingFace BertWordPiece / ByteLevelBPE / CharBPE
16k/30k. The reference vendors its vocab files under
rqvae/txtimg_datasets/tokenizers/pretrained/; set RQVAE_TPU_TOKENIZER_DIR (or
pass vocab_dir) to that directory — weights/vocab are data assets loaded at
runtime, never copied into this repo.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIRS = (
    os.environ.get("RQVAE_TPU_TOKENIZER_DIR", ""),
    os.path.join(os.path.dirname(__file__), "tokenizer_assets"),
    "/root/reference/rqvae/txtimg_datasets/tokenizers/pretrained",
)


def _find(name: str, vocab_dir: Optional[str] = None) -> str:
    dirs = ([vocab_dir] if vocab_dir else []) + [d for d in _DEFAULT_DIRS if d]
    for d in dirs:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"tokenizer asset {name!r} not found in {dirs}; set RQVAE_TPU_TOKENIZER_DIR"
    )


def create_tokenizer(tok_name: str, vocab_dir: Optional[str] = None, lowercase=True, dropout=None):
    from tokenizers import (
        BertWordPieceTokenizer,
        ByteLevelBPETokenizer,
        CharBPETokenizer,
    )

    if tok_name == "simple":
        from rqvae_tpu.data.clip_tokenizer import SimpleTokenizer

        return SimpleTokenizer(lowercase=lowercase)
    if tok_name == "bert_huggingface":
        return BertWordPieceTokenizer(
            vocab=_find("bert-base-uncased-vocab.txt", vocab_dir), lowercase=lowercase
        )
    if tok_name == "gpt2_huggingface":
        return ByteLevelBPETokenizer.from_file(
            vocab_filename=_find("vocab.json", vocab_dir),
            merges_filename=_find("merges.txt", vocab_dir),
            lowercase=lowercase,
            dropout=dropout,
        )
    if tok_name == "bpe16k_huggingface":
        return CharBPETokenizer.from_file(
            vocab_filename=_find("bpe-16k-vocab.json", vocab_dir),
            merges_filename=_find("bpe-16k-merges.txt", vocab_dir),
            unk_token="[UNK]",
            lowercase=lowercase,
            dropout=dropout,
        )
    if tok_name == "bpe30k_huggingface":
        return CharBPETokenizer.from_file(
            vocab_filename=_find("bpe-30k-vocab.json", vocab_dir),
            merges_filename=_find("bpe-30k-merges.txt", vocab_dir),
            unk_token="[UNK]",
            lowercase=lowercase,
            dropout=dropout,
        )
    raise KeyError(f"unknown tokenizer {tok_name}")


def prepare_tokenizer(tokenizer, context_length: int):
    """[PAD] padding + truncation to context_length (reference cc3m.py:36-40)."""
    tokenizer.add_special_tokens(["[PAD]"])
    tokenizer.enable_padding(
        length=context_length, pad_id=tokenizer.token_to_id("[PAD]")
    )
    tokenizer.enable_truncation(max_length=context_length)
    return tokenizer
