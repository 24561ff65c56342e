"""Convert reference PyTorch state_dicts to this framework's pytrees.

Enables loading the published kakaobrain checkpoints (stage1.pt / stage2.pt)
and golden parity testing against the reference implementation
(/root/reference/rqvae/trainers/trainer_rqvae.py:391-403 documents the ckpt
layout: {epoch, state_dict, discriminator, optimizer, scheduler,
state_dict_ema}).

Conversions are pure-numpy so they work without a GPU torch build:
 - torch Conv2d weight [out, in, kh, kw]  -> flax Conv kernel [kh, kw, in, out]
 - torch Linear weight [out, in]          -> flax Dense kernel [in, out]
 - torch (Group/Layer)Norm weight/bias    -> flax scale/bias
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from rqvae_tpu.ops.quantize import CodebookState, QuantizerConfig


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _convert_conv(tree, sd, tkey, path):
    _set(tree, path + ("kernel",), conv_kernel(sd[f"{tkey}.weight"]))
    if f"{tkey}.bias" in sd:
        _set(tree, path + ("bias",), _np(sd[f"{tkey}.bias"]))


def _convert_norm(tree, sd, tkey, path):
    # GroupNorm32 wraps flax GroupNorm under a "norm" child
    _set(tree, path + ("norm", "scale"), _np(sd[f"{tkey}.weight"]))
    _set(tree, path + ("norm", "bias"), _np(sd[f"{tkey}.bias"]))


def _convert_resblock(tree, sd, tprefix, path):
    _convert_norm(tree, sd, f"{tprefix}.norm1", path + ("norm1",))
    _convert_conv(tree, sd, f"{tprefix}.conv1", path + ("conv1",))
    _convert_norm(tree, sd, f"{tprefix}.norm2", path + ("norm2",))
    _convert_conv(tree, sd, f"{tprefix}.conv2", path + ("conv2",))
    if f"{tprefix}.nin_shortcut.weight" in sd:
        _convert_conv(tree, sd, f"{tprefix}.nin_shortcut", path + ("nin_shortcut",))
    if f"{tprefix}.conv_shortcut.weight" in sd:
        _convert_conv(tree, sd, f"{tprefix}.conv_shortcut", path + ("conv_shortcut",))


def _convert_attnblock(tree, sd, tprefix, path):
    _convert_norm(tree, sd, f"{tprefix}.norm", path + ("norm",))
    for name in ("q", "k", "v", "proj_out"):
        _convert_conv(tree, sd, f"{tprefix}.{name}", path + (name,))


def convert_encoder(sd: Mapping, prefix: str = "encoder.") -> dict:
    """Reference Encoder state_dict -> flax param subtree
    (keys per /root/reference/rqvae/models/rqvae/modules.py:10-98)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: dict = {}
    _convert_conv(tree, sd, "conv_in", ("conv_in",))
    levels = sorted({int(m.group(1)) for k in sd if (m := re.match(r"down\.(\d+)\.", k))})
    for i in levels:
        blocks = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"down\.{i}\.block\.(\d+)\.", k))}
        )
        for j in blocks:
            _convert_resblock(tree, sd, f"down.{i}.block.{j}", (f"down_{i}_block_{j}",))
        attns = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"down\.{i}\.attn\.(\d+)\.", k))}
        )
        for j in attns:
            _convert_attnblock(tree, sd, f"down.{i}.attn.{j}", (f"down_{i}_attn_{j}",))
        if f"down.{i}.downsample.conv.weight" in sd:
            _convert_conv(
                tree, sd, f"down.{i}.downsample.conv", (f"down_{i}_downsample", "conv")
            )
    _convert_resblock(tree, sd, "mid.block_1", ("mid_block_1",))
    _convert_attnblock(tree, sd, "mid.attn_1", ("mid_attn_1",))
    _convert_resblock(tree, sd, "mid.block_2", ("mid_block_2",))
    _convert_norm(tree, sd, "norm_out", ("norm_out",))
    _convert_conv(tree, sd, "conv_out", ("conv_out",))
    return tree


def convert_decoder(sd: Mapping, prefix: str = "decoder.") -> dict:
    """Reference Decoder state_dict -> flax param subtree
    (keys per /root/reference/rqvae/models/rqvae/modules.py:101-202)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: dict = {}
    _convert_conv(tree, sd, "conv_in", ("conv_in",))
    _convert_resblock(tree, sd, "mid.block_1", ("mid_block_1",))
    _convert_attnblock(tree, sd, "mid.attn_1", ("mid_attn_1",))
    _convert_resblock(tree, sd, "mid.block_2", ("mid_block_2",))
    levels = sorted({int(m.group(1)) for k in sd if (m := re.match(r"up\.(\d+)\.", k))})
    for i in levels:
        blocks = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"up\.{i}\.block\.(\d+)\.", k))}
        )
        for j in blocks:
            _convert_resblock(tree, sd, f"up.{i}.block.{j}", (f"up_{i}_block_{j}",))
        attns = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"up\.{i}\.attn\.(\d+)\.", k))}
        )
        for j in attns:
            _convert_attnblock(tree, sd, f"up.{i}.attn.{j}", (f"up_{i}_attn_{j}",))
        if f"up.{i}.upsample.conv.weight" in sd:
            _convert_conv(tree, sd, f"up.{i}.upsample.conv", (f"up_{i}_upsample", "conv"))
    _convert_norm(tree, sd, "norm_out", ("norm_out",))
    _convert_conv(tree, sd, "conv_out", ("conv_out",))
    return tree


def convert_codebooks(sd: Mapping, qcfg: QuantizerConfig, prefix: str = "quantizer.") -> CodebookState:
    """Reference RQBottleneck codebooks -> CodebookState.

    torch stores nn.Embedding(n_embed + 1) with a zero padding row
    (quantizations.py:28); we drop the padding row (it is implicit here).
    Shared codebooks appear D times in the state_dict but are one tensor.
    """
    n_books = qcfg.n_codebooks
    n_embed = max(qcfg.n_embed)
    dim = qcfg.embed_dim

    embed = np.zeros((n_books, n_embed, dim), np.float32)
    cluster = np.zeros((n_books, n_embed), np.float32)
    ema = np.zeros((n_books, n_embed, dim), np.float32)
    for b in range(n_books):
        w = _np(sd[f"{prefix}codebooks.{b}.weight"])
        embed[b, : qcfg.n_embed[b]] = w[:-1]
        ck = f"{prefix}codebooks.{b}.cluster_size_ema"
        if ck in sd:
            cluster[b, : qcfg.n_embed[b]] = _np(sd[ck])
            ema[b, : qcfg.n_embed[b]] = _np(sd[f"{prefix}codebooks.{b}.embed_ema"])
        else:
            ema[b] = embed[b]
    import jax.numpy as jnp

    return CodebookState(
        embed=jnp.asarray(embed),
        cluster_size=jnp.asarray(cluster),
        embed_ema=jnp.asarray(ema),
    )


def convert_rqvae(sd: Mapping, qcfg: QuantizerConfig) -> tuple[dict, CodebookState]:
    """Full reference RQVAE state_dict -> (flax params, CodebookState)."""
    params: dict = {}
    params["encoder"] = convert_encoder(sd, "encoder.")
    params["decoder"] = convert_decoder(sd, "decoder.")
    _convert_conv(params, sd, "quant_conv", ("quant_conv",))
    _convert_conv(params, sd, "post_quant_conv", ("post_quant_conv",))
    codebook = convert_codebooks(sd, qcfg, "quantizer.")
    return params, codebook


def _convert_stack(sd: Mapping, prefix: str, n_layer: int) -> dict:
    """Reference AttentionStack blocks -> stacked [n_layer, ...] arrays
    (keys per /root/reference/rqvae/models/rqtransformer/attentions.py)."""

    def stack(fmt, transform):
        return np.stack([transform(_np(sd[fmt.format(i)])) for i in range(n_layer)])

    ident = lambda w: w
    return {
        "ln1": {
            "scale": stack(prefix + ".blocks.{}.ln1.weight", ident),
            "bias": stack(prefix + ".blocks.{}.ln1.bias", ident),
        },
        "ln2": {
            "scale": stack(prefix + ".blocks.{}.ln2.weight", ident),
            "bias": stack(prefix + ".blocks.{}.ln2.bias", ident),
        },
        "attn": {
            "wq": stack(prefix + ".blocks.{}.attn.query.weight", np.transpose),
            "wk": stack(prefix + ".blocks.{}.attn.key.weight", np.transpose),
            "wv": stack(prefix + ".blocks.{}.attn.value.weight", np.transpose),
            "wo": stack(prefix + ".blocks.{}.attn.proj.weight", np.transpose),
            "bq": stack(prefix + ".blocks.{}.attn.query.bias", ident),
            "bk": stack(prefix + ".blocks.{}.attn.key.bias", ident),
            "bv": stack(prefix + ".blocks.{}.attn.value.bias", ident),
            "bo": stack(prefix + ".blocks.{}.attn.proj.bias", ident),
        },
        "mlp": {
            "w1": stack(prefix + ".blocks.{}.mlp.0.weight", np.transpose),
            "b1": stack(prefix + ".blocks.{}.mlp.0.bias", ident),
            "w2": stack(prefix + ".blocks.{}.mlp.2.weight", np.transpose),
            "b2": stack(prefix + ".blocks.{}.mlp.2.bias", ident),
        },
    }


def convert_rqtransformer(sd: Mapping, config) -> dict:
    """Reference RQTransformer state_dict -> functional param pytree
    (keys per /root/reference/rqvae/models/rqtransformer/transformers.py:54-105).
    `config` is a rqvae_tpu TransformerConfig."""
    params: dict = {
        "cond_emb": _np(sd["cond_emb.weight"]),
        "pos_emb_cond": _np(sd["pos_emb_cond"]),
        "pos_emb_hw": _np(sd["pos_emb_hw"]),
        "pos_emb_d": _np(sd["pos_emb_d"]),
        "body": _convert_stack(sd, "body_transformer", config.body.n_layer),
        "head": _convert_stack(sd, "head_transformer", config.head.n_layer),
    }
    if "input_mlp.weight" in sd:
        params["input_mlp"] = {
            "kernel": linear_kernel(sd["input_mlp.weight"]),
            "bias": _np(sd["input_mlp.bias"]),
        }
    if "head_mlp.weight" in sd:
        params["head_mlp"] = {
            "kernel": linear_kernel(sd["head_mlp.weight"]),
            "bias": _np(sd["head_mlp.bias"]),
        }
    if "tok_emb.weight" in sd:
        params["tok_emb"] = _np(sd["tok_emb.weight"])

    cls = {
        "ln_scale": _np(sd["classifier.layer_norm.weight"]),
        "ln_bias": _np(sd["classifier.layer_norm.bias"]),
    }
    w = _np(sd["classifier.linear.weight"])
    if w.ndim == 3:  # BatchLinear [D, in, out] — already in/out layout
        cls["kernel"] = w
        cls["bias"] = _np(sd["classifier.linear.bias"])
    else:  # nn.Linear [out, in]
        cls["kernel"] = w.T
        cls["bias"] = _np(sd["classifier.linear.bias"])
    params["classifier"] = cls

    if "cond_classifier.layer_norm.weight" in sd:
        params["cond_classifier"] = {
            "ln_scale": _np(sd["cond_classifier.layer_norm.weight"]),
            "ln_bias": _np(sd["cond_classifier.layer_norm.bias"]),
            "kernel": linear_kernel(sd["cond_classifier.linear.weight"]),
            "bias": _np(sd["cond_classifier.linear.bias"]),
        }
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt checkpoint into numpy arrays (CPU torch required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _np(v) for k, v in sd.items()}
