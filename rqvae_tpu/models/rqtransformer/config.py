"""RQ-Transformer configuration.

Mirrors the reference dataclasses
(/root/reference/rqvae/models/rqtransformer/configs.py:21-73) as frozen
dataclasses consumable by the functional model."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StackConfig:
    n_layer: int
    n_head: int
    embed_dim: int
    mlp_bias: bool = True
    attn_bias: bool = True
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.1
    gelu: str = "v1"


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: Tuple[int, ...]  # per-depth codebook sizes
    block_size: Tuple[int, int, int]  # (H, W, D)
    embed_dim: int
    body: StackConfig
    head: StackConfig
    vocab_size_cond: int = 1  # >=1; 1 => SOS provider (transformers.py:57)
    block_size_cond: int = 1
    input_embed_dim: Optional[int] = None
    input_emb_vqvae: bool = False
    head_emb_vqvae: bool = False
    cumsum_depth_ctx: bool = False
    shared_tok_emb: bool = False
    shared_cls_emb: bool = False
    embd_pdrop: float = 0.0

    @property
    def depth(self) -> int:
        return self.block_size[2]

    @property
    def hw(self) -> int:
        return self.block_size[0] * self.block_size[1]

    @property
    def body_seq_len(self) -> int:
        # cond tokens + H*W-1 shifted token embeddings (transformers.py:136-142)
        return self.block_size_cond + self.hw - 1

    @property
    def vocab_size_max(self) -> int:
        return max(self.vocab_size)

    @property
    def heterogeneous_vocab(self) -> bool:
        return [self.vocab_size[0]] * len(self.vocab_size) != list(self.vocab_size)

    @staticmethod
    def create(cfg) -> "TransformerConfig":
        """From an augmented arch config (utils/config.py RQTRANSFORMER_DEFAULTS)."""
        block_size = tuple(cfg["block_size"])
        depth = block_size[2]
        vocab = cfg["vocab_size"]
        vocab = tuple(vocab) if isinstance(vocab, (list, tuple)) else (vocab,) * depth
        assert len(vocab) == depth

        if cfg.get("shared_tok_emb") or cfg.get("shared_cls_emb"):
            assert len(set(vocab)) == 1, (
                "shared tok/cls embedding requires equal codebook sizes"
            )

        def stack(s):
            b = s["block"]
            return StackConfig(
                n_layer=s["n_layer"],
                n_head=b["n_head"],
                embed_dim=b.get("embed_dim") or cfg["embed_dim"],
                mlp_bias=b.get("mlp_bias", True),
                attn_bias=b.get("attn_bias", True),
                attn_pdrop=b.get("attn_pdrop", 0.0),
                resid_pdrop=b.get("resid_pdrop", 0.1),
                gelu=b.get("gelu", "v1"),
            )

        vocab_size_cond = max(cfg.get("vocab_size_cond", 0) or 0, 1)
        block_size_cond = max(cfg.get("block_size_cond", 0) or 0, 1)
        assert not (block_size_cond > 1 and vocab_size_cond == 1)

        return TransformerConfig(
            vocab_size=vocab,
            block_size=block_size,
            embed_dim=cfg["embed_dim"],
            body=stack(cfg["body"]),
            head=stack(cfg["head"]),
            vocab_size_cond=vocab_size_cond,
            block_size_cond=block_size_cond,
            input_embed_dim=cfg.get("input_embed_dim"),
            input_emb_vqvae=cfg.get("input_emb_vqvae", False),
            head_emb_vqvae=cfg.get("head_emb_vqvae", False),
            cumsum_depth_ctx=cfg.get("cumsum_depth_ctx", False),
            shared_tok_emb=cfg.get("shared_tok_emb", False),
            shared_cls_emb=cfg.get("shared_cls_emb", False),
            embd_pdrop=cfg.get("embd_pdrop", 0.0),
        )
