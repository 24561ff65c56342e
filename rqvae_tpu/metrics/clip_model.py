"""CLIP ViT-B/32 in pure JAX + torch-weight converters.

Independent implementation of the CLIP architecture (radford et al. 2021)
used by the reference's CLIP score (/root/reference/rqvae/metrics/
clip_score.py:28-47 — `clip.load("ViT-B/32")`): a patch-conv vision
transformer and a causal text transformer, both pre-LN with quickGELU MLPs,
projected into a shared embedding space. Written TPU-first: stacked [L, ...]
parameter arrays with a `lax.scan` over layers (same convention as
models/rqtransformer), bf16-friendly matmuls, no torch at inference time.

Two converters ingest the public checkpoint layouts (same pattern as
metrics/inception.py's torchvision converter):
  * `convert_openai_clip`  — OpenAI `clip` package state_dict
    ("visual.conv1.weight", packed "attn.in_proj_weight", ...)
  * `convert_hf_clip`      — HuggingFace CLIPModel state_dict
    ("vision_model.encoder.layers.N.self_attn.q_proj.weight", ...)

Text pooling follows OpenAI semantics: the embedding is taken at
`argmax(token_ids)` (the end-of-text token has the highest id in the CLIP
vocab). Numeric parity vs an executed torch CLIPModel is pinned in
tests/test_eval_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512
    ln_eps: float = 1e-5


# CLIP's torchvision preprocessing constants (clip.load -> _transform)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - mu).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention(x, layer, n_head, causal, eps):
    """Pre-LN packed-QKV multi-head self-attention block (one layer)."""
    B, T, W = x.shape
    h = _layer_norm(x, layer["ln1_scale"], layer["ln1_bias"], eps)
    qkv = h @ layer["w_in"] + layer["b_in"]  # [B, T, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = W // n_head

    def heads(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, W)
    x = x + o @ layer["w_out"] + layer["b_out"]

    h = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], eps)
    h = _quick_gelu(h @ layer["w1"] + layer["b1"])
    return x + h @ layer["w2"] + layer["b2"]


def _transformer(x, blocks, n_head, causal, eps):
    def body(carry, layer):
        return _attention(carry, layer, n_head, causal, eps), None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def encode_image(params, config: CLIPConfig, pixels):
    """pixels: [B, H, W, 3] preprocessed (normalized) -> [B, embed_dim]."""
    v = params["visual"]
    x = jax.lax.conv_general_dilated(
        pixels, v["conv"],
        window_strides=(config.patch_size, config.patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, gh, gw, W = x.shape
    x = x.reshape(B, gh * gw, W)
    cls = jnp.broadcast_to(v["class_emb"], (B, 1, W)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + v["pos_emb"]
    x = _layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"], config.ln_eps)
    x = _transformer(x, v["blocks"], config.vision_heads, False, config.ln_eps)
    x = _layer_norm(
        x[:, 0], v["ln_post_scale"], v["ln_post_bias"], config.ln_eps
    )
    return x @ v["proj"]


def encode_text(params, config: CLIPConfig, tokens):
    """tokens: [B, T] int32 -> [B, embed_dim] (pooled at argmax token id —
    the OpenAI end-of-text convention)."""
    t = params["text"]
    x = t["token_emb"][tokens] + t["pos_emb"][: tokens.shape[1]]
    x = _transformer(x, t["blocks"], config.text_heads, True, config.ln_eps)
    x = _layer_norm(x, t["ln_final_scale"], t["ln_final_bias"], config.ln_eps)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ t["text_proj"]


@jax.jit
def _cosine(img, txt):
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return (img * txt).sum(-1)


def clip_scores(params, config: CLIPConfig, pixels, tokens):
    """cosine(image emb, text emb) per pair — reference clip_score.py:46."""
    img = encode_image(params, config, pixels)
    txt = encode_text(params, config, tokens)
    return _cosine(img, txt)


def preprocess_images(pixels01: np.ndarray, image_size: int = 224) -> np.ndarray:
    """[B,H,W,3] float in [0,1] -> normalized [B,S,S,3] (CLIP _transform:
    bicubic resize of the short side + center crop + normalize)."""
    from PIL import Image

    out = np.empty((pixels01.shape[0], image_size, image_size, 3), np.float32)
    for i, p in enumerate(pixels01):
        im = Image.fromarray((np.clip(p, 0, 1) * 255).astype(np.uint8))
        w, h = im.size
        s = image_size / min(w, h)
        im = im.resize(
            (max(image_size, round(w * s)), max(image_size, round(h * s))),
            Image.BICUBIC,
        )
        w, h = im.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        out[i] = np.asarray(im, np.float32) / 255.0
    return (out - IMAGE_MEAN) / IMAGE_STD


# ---------------------------------------------------------------------------
# torch state_dict converters
# ---------------------------------------------------------------------------


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t, np.float32)


def _stack_blocks(layers):
    return {
        k: jnp.asarray(np.stack([l[k] for l in layers])) for k in layers[0]
    }


def convert_openai_clip(
    sd, vision_heads: Optional[int] = None, text_heads: Optional[int] = None
) -> tuple[dict, CLIPConfig]:
    """OpenAI `clip` package / published ViT-B-32.pt layout: packed
    `attn.in_proj_weight` per resblock, `visual.` / bare-text prefixes.
    Dims are inferred from tensor shapes; head counts default to the CLIP
    family's head_dim=64 rule (override for non-standard geometries)."""
    vw, three, p, _ = _np(sd["visual.conv1.weight"]).shape
    n_vis = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks.")
    )
    n_txt = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    )
    tw = _np(sd["ln_final.weight"]).shape[0]
    grid = int(np.sqrt(_np(sd["visual.positional_embedding"]).shape[0] - 1))
    config = CLIPConfig(
        image_size=grid * p, patch_size=p, vision_width=vw, vision_layers=n_vis,
        vision_heads=vision_heads or vw // 64, text_width=tw, text_layers=n_txt,
        text_heads=text_heads or tw // 64,
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        context_length=_np(sd["positional_embedding"]).shape[0],
        embed_dim=_np(sd["text_projection"]).shape[1],
    )

    def block(prefix):
        return {
            "ln1_scale": _np(sd[f"{prefix}.ln_1.weight"]),
            "ln1_bias": _np(sd[f"{prefix}.ln_1.bias"]),
            "w_in": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "b_in": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            "w_out": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "b_out": _np(sd[f"{prefix}.attn.out_proj.bias"]),
            "ln2_scale": _np(sd[f"{prefix}.ln_2.weight"]),
            "ln2_bias": _np(sd[f"{prefix}.ln_2.bias"]),
            "w1": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "b1": _np(sd[f"{prefix}.mlp.c_fc.bias"]),
            "w2": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "b2": _np(sd[f"{prefix}.mlp.c_proj.bias"]),
        }

    params = {
        "visual": {
            # torch conv OIHW -> HWIO
            "conv": jnp.asarray(
                _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)
            ),
            "class_emb": jnp.asarray(_np(sd["visual.class_embedding"])),
            "pos_emb": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre_scale": jnp.asarray(_np(sd["visual.ln_pre.weight"])),
            "ln_pre_bias": jnp.asarray(_np(sd["visual.ln_pre.bias"])),
            "blocks": _stack_blocks(
                [block(f"visual.transformer.resblocks.{i}") for i in range(n_vis)]
            ),
            "ln_post_scale": jnp.asarray(_np(sd["visual.ln_post.weight"])),
            "ln_post_bias": jnp.asarray(_np(sd["visual.ln_post.bias"])),
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        },
        "text": {
            "token_emb": jnp.asarray(_np(sd["token_embedding.weight"])),
            "pos_emb": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": _stack_blocks(
                [block(f"transformer.resblocks.{i}") for i in range(n_txt)]
            ),
            "ln_final_scale": jnp.asarray(_np(sd["ln_final.weight"])),
            "ln_final_bias": jnp.asarray(_np(sd["ln_final.bias"])),
            "text_proj": jnp.asarray(_np(sd["text_projection"])),
        },
    }
    return params, config


def convert_hf_clip(
    sd, vision_heads: Optional[int] = None, text_heads: Optional[int] = None
) -> tuple[dict, CLIPConfig]:
    """HuggingFace CLIPModel layout: split q/k/v projections under
    `vision_model.` / `text_model.` prefixes (openai/clip-vit-base-patch32
    torch weights)."""
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vw, _, p, _ = conv.shape
    n_vis = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("vision_model.encoder.layers.")
    )
    n_txt = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers.")
    )
    tw = _np(sd["text_model.final_layer_norm.weight"]).shape[0]
    pos = _np(sd["vision_model.embeddings.position_embedding.weight"])
    grid = int(np.sqrt(pos.shape[0] - 1))
    config = CLIPConfig(
        image_size=grid * p, patch_size=p, vision_width=vw, vision_layers=n_vis,
        vision_heads=vision_heads or vw // 64, text_width=tw, text_layers=n_txt,
        text_heads=text_heads or tw // 64,
        vocab_size=_np(sd["text_model.embeddings.token_embedding.weight"]).shape[0],
        context_length=_np(
            sd["text_model.embeddings.position_embedding.weight"]
        ).shape[0],
        embed_dim=_np(sd["visual_projection.weight"]).shape[0],
    )

    def block(prefix):
        wq = _np(sd[f"{prefix}.self_attn.q_proj.weight"])
        wk = _np(sd[f"{prefix}.self_attn.k_proj.weight"])
        wv = _np(sd[f"{prefix}.self_attn.v_proj.weight"])
        bq = _np(sd[f"{prefix}.self_attn.q_proj.bias"])
        bk = _np(sd[f"{prefix}.self_attn.k_proj.bias"])
        bv = _np(sd[f"{prefix}.self_attn.v_proj.bias"])
        return {
            "ln1_scale": _np(sd[f"{prefix}.layer_norm1.weight"]),
            "ln1_bias": _np(sd[f"{prefix}.layer_norm1.bias"]),
            "w_in": np.concatenate([wq.T, wk.T, wv.T], axis=1),
            "b_in": np.concatenate([bq, bk, bv]),
            "w_out": _np(sd[f"{prefix}.self_attn.out_proj.weight"]).T,
            "b_out": _np(sd[f"{prefix}.self_attn.out_proj.bias"]),
            "ln2_scale": _np(sd[f"{prefix}.layer_norm2.weight"]),
            "ln2_bias": _np(sd[f"{prefix}.layer_norm2.bias"]),
            "w1": _np(sd[f"{prefix}.mlp.fc1.weight"]).T,
            "b1": _np(sd[f"{prefix}.mlp.fc1.bias"]),
            "w2": _np(sd[f"{prefix}.mlp.fc2.weight"]).T,
            "b2": _np(sd[f"{prefix}.mlp.fc2.bias"]),
        }

    # HF stores pre-LN under the (sic) key "pre_layrnorm"
    pre_w = "vision_model.pre_layrnorm.weight"
    if pre_w not in sd:
        pre_w = "vision_model.pre_layernorm.weight"
    pre_b = pre_w.replace("weight", "bias")
    params = {
        "visual": {
            "conv": jnp.asarray(conv.transpose(2, 3, 1, 0)),
            "class_emb": jnp.asarray(
                _np(sd["vision_model.embeddings.class_embedding"])
            ),
            "pos_emb": jnp.asarray(pos),
            "ln_pre_scale": jnp.asarray(_np(sd[pre_w])),
            "ln_pre_bias": jnp.asarray(_np(sd[pre_b])),
            "blocks": _stack_blocks(
                [block(f"vision_model.encoder.layers.{i}") for i in range(n_vis)]
            ),
            "ln_post_scale": jnp.asarray(
                _np(sd["vision_model.post_layernorm.weight"])
            ),
            "ln_post_bias": jnp.asarray(
                _np(sd["vision_model.post_layernorm.bias"])
            ),
            "proj": jnp.asarray(_np(sd["visual_projection.weight"]).T),
        },
        "text": {
            "token_emb": jnp.asarray(
                _np(sd["text_model.embeddings.token_embedding.weight"])
            ),
            "pos_emb": jnp.asarray(
                _np(sd["text_model.embeddings.position_embedding.weight"])
            ),
            "blocks": _stack_blocks(
                [block(f"text_model.encoder.layers.{i}") for i in range(n_txt)]
            ),
            "ln_final_scale": jnp.asarray(
                _np(sd["text_model.final_layer_norm.weight"])
            ),
            "ln_final_bias": jnp.asarray(
                _np(sd["text_model.final_layer_norm.bias"])
            ),
            "text_proj": jnp.asarray(_np(sd["text_projection.weight"]).T),
        },
    }
    return params, config


def convert_torch_clip(sd) -> tuple[dict, CLIPConfig]:
    """Layout sniffer: dispatch on the key prefixes."""
    if any(k.startswith("visual.conv1") for k in sd):
        return convert_openai_clip(sd)
    if any(k.startswith("vision_model.") for k in sd):
        return convert_hf_clip(sd)
    raise ValueError(
        "unrecognized CLIP state_dict layout (expected OpenAI `visual.*` or "
        f"HuggingFace `vision_model.*` keys; got e.g. {list(sd)[:3]})"
    )
