"""Export this framework's pytrees as reference-format torch state_dicts.

Inverse of torch_convert.py: a model trained HERE can be loaded by the
reference implementation (torch `.pt` with the key layout of
/root/reference/rqvae/models/rqvae/rqvae.py and
rqvae/models/rqtransformer/transformers.py) — migration works in BOTH
directions. Round-trip invertibility (ref sd -> pytree -> sd, bit-exact) is
asserted in tests/test_torch_export.py.

Pure numpy: no torch required until `save_reference_checkpoint` writes the
file.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from rqvae_tpu.ops.quantize import CodebookState, QuantizerConfig


def _np32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv_weight(kernel) -> np.ndarray:
    # flax [kh, kw, in, out] -> torch [out, in, kh, kw]
    return _np32(kernel).transpose(3, 2, 0, 1)


def _export_conv(sd, tkey: str, node: dict):
    sd[f"{tkey}.weight"] = _conv_weight(node["kernel"])
    if "bias" in node:
        sd[f"{tkey}.bias"] = _np32(node["bias"])


def _export_norm(sd, tkey: str, node: dict):
    sd[f"{tkey}.weight"] = _np32(node["norm"]["scale"])
    sd[f"{tkey}.bias"] = _np32(node["norm"]["bias"])


def _export_resblock(sd, tprefix: str, node: dict):
    _export_norm(sd, f"{tprefix}.norm1", node["norm1"])
    _export_conv(sd, f"{tprefix}.conv1", node["conv1"])
    _export_norm(sd, f"{tprefix}.norm2", node["norm2"])
    _export_conv(sd, f"{tprefix}.conv2", node["conv2"])
    if "nin_shortcut" in node:
        _export_conv(sd, f"{tprefix}.nin_shortcut", node["nin_shortcut"])
    if "conv_shortcut" in node:
        _export_conv(sd, f"{tprefix}.conv_shortcut", node["conv_shortcut"])


def _export_attnblock(sd, tprefix: str, node: dict):
    _export_norm(sd, f"{tprefix}.norm", node["norm"])
    for name in ("q", "k", "v", "proj_out"):
        _export_conv(sd, f"{tprefix}.{name}", node[name])


def _export_coder(sd, params: dict, prefix: str, updown: str):
    """Shared encoder/decoder walk (flax names down_i_block_j etc. back to
    the reference's nested Module lists)."""
    _export_conv(sd, f"{prefix}conv_in", params["conv_in"])
    for name, node in params.items():
        if name.startswith(f"{updown}_"):
            parts = name.split("_")
            i = parts[1]
            kind = parts[2]
            if kind == "block":
                _export_resblock(sd, f"{prefix}{updown}.{i}.block.{parts[3]}", node)
            elif kind == "attn":
                _export_attnblock(sd, f"{prefix}{updown}.{i}.attn.{parts[3]}", node)
            elif kind in ("downsample", "upsample"):
                _export_conv(sd, f"{prefix}{updown}.{i}.{kind}.conv", node["conv"])
    _export_resblock(sd, f"{prefix}mid.block_1", params["mid_block_1"])
    _export_attnblock(sd, f"{prefix}mid.attn_1", params["mid_attn_1"])
    _export_resblock(sd, f"{prefix}mid.block_2", params["mid_block_2"])
    _export_norm(sd, f"{prefix}norm_out", params["norm_out"])
    _export_conv(sd, f"{prefix}conv_out", params["conv_out"])


def export_rqvae(
    params: dict, codebook: CodebookState, qcfg: QuantizerConfig
) -> Dict[str, np.ndarray]:
    """(flax params, CodebookState) -> reference RQVAE state_dict."""
    sd: Dict[str, np.ndarray] = {}
    _export_coder(sd, params["encoder"], "encoder.", "down")
    _export_coder(sd, params["decoder"], "decoder.", "up")
    _export_conv(sd, "quant_conv", params["quant_conv"])
    _export_conv(sd, "post_quant_conv", params["post_quant_conv"])

    # the reference ModuleList holds one entry PER DEPTH even when the
    # codebook is shared (the same module repeated -> duplicate keys in the
    # state_dict, quantizations.py:170-176)
    for d in range(qcfg.depth):
        b = qcfg.codebook_index(d)
        n = qcfg.n_embed[b]
        w = _np32(codebook.embed[b][:n])
        # reference nn.Embedding(n_embed + 1) with a zero padding row
        # (quantizations.py:28)
        sd[f"quantizer.codebooks.{d}.weight"] = np.concatenate(
            [w, np.zeros((1, w.shape[1]), np.float32)]
        )
        sd[f"quantizer.codebooks.{d}.cluster_size_ema"] = _np32(
            codebook.cluster_size[b][:n]
        )
        sd[f"quantizer.codebooks.{d}.embed_ema"] = _np32(codebook.embed_ema[b][:n])
    return sd


def _export_stack(sd, prefix: str, stack: dict):
    n_layer = stack["ln1"]["scale"].shape[0]
    for i in range(n_layer):
        b = f"{prefix}.blocks.{i}"
        sd[f"{b}.ln1.weight"] = _np32(stack["ln1"]["scale"][i])
        sd[f"{b}.ln1.bias"] = _np32(stack["ln1"]["bias"][i])
        sd[f"{b}.ln2.weight"] = _np32(stack["ln2"]["scale"][i])
        sd[f"{b}.ln2.bias"] = _np32(stack["ln2"]["bias"][i])
        attn = stack["attn"]
        sd[f"{b}.attn.query.weight"] = _np32(attn["wq"][i]).T
        sd[f"{b}.attn.key.weight"] = _np32(attn["wk"][i]).T
        sd[f"{b}.attn.value.weight"] = _np32(attn["wv"][i]).T
        sd[f"{b}.attn.proj.weight"] = _np32(attn["wo"][i]).T
        sd[f"{b}.attn.query.bias"] = _np32(attn["bq"][i])
        sd[f"{b}.attn.key.bias"] = _np32(attn["bk"][i])
        sd[f"{b}.attn.value.bias"] = _np32(attn["bv"][i])
        sd[f"{b}.attn.proj.bias"] = _np32(attn["bo"][i])
        mlp = stack["mlp"]
        sd[f"{b}.mlp.0.weight"] = _np32(mlp["w1"][i]).T
        sd[f"{b}.mlp.0.bias"] = _np32(mlp["b1"][i])
        sd[f"{b}.mlp.2.weight"] = _np32(mlp["w2"][i]).T
        sd[f"{b}.mlp.2.bias"] = _np32(mlp["b2"][i])


def export_rqtransformer(params: dict, config) -> Dict[str, np.ndarray]:
    """Functional param pytree -> reference RQTransformer state_dict."""
    sd: Dict[str, np.ndarray] = {
        "cond_emb.weight": _np32(params["cond_emb"]),
        "pos_emb_cond": _np32(params["pos_emb_cond"]),
        "pos_emb_hw": _np32(params["pos_emb_hw"]),
        "pos_emb_d": _np32(params["pos_emb_d"]),
    }
    _export_stack(sd, "body_transformer", params["body"])
    _export_stack(sd, "head_transformer", params["head"])
    if "input_mlp" in params:
        sd["input_mlp.weight"] = _np32(params["input_mlp"]["kernel"]).T
        sd["input_mlp.bias"] = _np32(params["input_mlp"]["bias"])
    if "head_mlp" in params:
        sd["head_mlp.weight"] = _np32(params["head_mlp"]["kernel"]).T
        sd["head_mlp.bias"] = _np32(params["head_mlp"]["bias"])
    if "tok_emb" in params:
        sd["tok_emb.weight"] = _np32(params["tok_emb"])
        if not config.shared_tok_emb:
            # reference TupleEmbedding registers its per-depth offsets as a
            # buffer (primitives.py:33-34); recompute from the config
            sd["tok_emb.offsets"] = np.cumsum(
                [0] + list(config.vocab_size[:-1])
            ).astype(np.int64)

    cls = params["classifier"]
    sd["classifier.layer_norm.weight"] = _np32(cls["ln_scale"])
    sd["classifier.layer_norm.bias"] = _np32(cls["ln_bias"])
    k = _np32(cls["kernel"])
    # BatchLinear keeps [D, in, out]; nn.Linear wants [out, in]
    sd["classifier.linear.weight"] = k if k.ndim == 3 else k.T
    sd["classifier.linear.bias"] = _np32(cls["bias"])

    if "cond_classifier" in params:
        cc = params["cond_classifier"]
        sd["cond_classifier.layer_norm.weight"] = _np32(cc["ln_scale"])
        sd["cond_classifier.layer_norm.bias"] = _np32(cc["ln_bias"])
        sd["cond_classifier.linear.weight"] = _np32(cc["kernel"]).T
        sd["cond_classifier.linear.bias"] = _np32(cc["bias"])
    return sd


def save_reference_checkpoint(path: str, sd: Dict[str, np.ndarray], epoch: int = 0):
    """Write a reference-format .pt ({epoch, state_dict} of torch tensors)."""
    import torch

    torch.save(
        {"epoch": epoch, "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}},
        path,
    )
