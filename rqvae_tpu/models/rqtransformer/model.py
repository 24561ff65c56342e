"""RQ-Transformer: spatial "body" AR transformer over H*W positions plus a
depth "head" transformer over D residual levels per position.

TPU-native functional re-design of the reference RQTransformer
(/root/reference/rqvae/models/rqtransformer/transformers.py:34-410 and
attentions.py:39-169). Differences from the torch original, by design:

 - Pure functions over an explicit parameter pytree; per-layer weights are
   STACKED along a leading layer axis so the whole stack runs as one
   `lax.scan` — one compiled layer body regardless of depth (42-layer 3.8B
   compiles as fast as 4 layers) and a natural target for pjit sharding.
 - Teacher-forced forward and single-step decode share the same layer math;
   decode keeps fixed-shape KV caches updated via dynamic_update_slice
   (replacing torch tensor-concat caches, attentions.py:73-84).
 - Attention logits/softmax accumulate in fp32 (MXU-friendly bf16 inputs).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.rqtransformer.config import StackConfig, TransformerConfig

LN_EPS = 1e-5  # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# parameter initialisation
# ---------------------------------------------------------------------------


def _dense_init(key, shape, std=0.02):
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def init_stack_params(key, cfg: StackConfig) -> dict:
    C, L = cfg.embed_dim, cfg.n_layer
    ks = jax.random.split(key, 6)
    return {
        "ln1": {"scale": jnp.ones((L, C)), "bias": jnp.zeros((L, C))},
        "ln2": {"scale": jnp.ones((L, C)), "bias": jnp.zeros((L, C))},
        "attn": {
            "wq": _dense_init(ks[0], (L, C, C)),
            "wk": _dense_init(ks[1], (L, C, C)),
            "wv": _dense_init(ks[2], (L, C, C)),
            "wo": _dense_init(ks[3], (L, C, C)),
            "bq": jnp.zeros((L, C)),
            "bk": jnp.zeros((L, C)),
            "bv": jnp.zeros((L, C)),
            "bo": jnp.zeros((L, C)),
        },
        "mlp": {
            "w1": _dense_init(ks[4], (L, C, 4 * C)),
            "b1": jnp.zeros((L, 4 * C)),
            "w2": _dense_init(ks[5], (L, 4 * C, C)),
            "b2": jnp.zeros((L, C)),
        },
    }


def init_transformer_params(key, config: TransformerConfig) -> dict:
    """GPT-style N(0, 0.02) init (reference interfaces.py:62-69 convention;
    pos embeddings per transformers.py:79-81)."""
    C = config.embed_dim
    D = config.depth
    ks = iter(jax.random.split(key, 16))
    params: dict = {
        "cond_emb": _dense_init(next(ks), (config.vocab_size_cond, C)),
        "pos_emb_cond": _dense_init(next(ks), (1, config.block_size_cond, C)),
        "pos_emb_hw": _dense_init(next(ks), (1, config.hw, C)),
        "pos_emb_d": _dense_init(next(ks), (1, D, C)),
        "body": init_stack_params(next(ks), config.body),
        "head": init_stack_params(next(ks), config.head),
    }

    if config.input_emb_vqvae:
        params["input_mlp"] = {
            "kernel": _dense_init(next(ks), (config.input_embed_dim, C)),
            "bias": jnp.zeros((C,)),
        }
    if config.head_emb_vqvae:
        params["head_mlp"] = {
            "kernel": _dense_init(next(ks), (config.input_embed_dim, C)),
            "bias": jnp.zeros((C,)),
        }
    if not (config.input_emb_vqvae and config.head_emb_vqvae):
        if config.shared_tok_emb:
            params["tok_emb"] = _dense_init(next(ks), (config.vocab_size[0], C))
        else:
            # TupleEmbedding: one table for all depths with offsets
            # (reference primitives.py:25-72)
            params["tok_emb"] = _dense_init(next(ks), (sum(config.vocab_size), C))

    cls: dict = {"ln_scale": jnp.ones((C,)), "ln_bias": jnp.zeros((C,))}
    if config.shared_cls_emb:
        cls["kernel"] = _dense_init(next(ks), (C, config.vocab_size[0]))
        cls["bias"] = jnp.zeros((config.vocab_size[0],))
    else:
        # BatchLinear: per-depth classifier heads (primitives.py:92-165)
        cls["kernel"] = _dense_init(next(ks), (D, C, config.vocab_size_max))
        cls["bias"] = jnp.zeros((D, config.vocab_size_max))
    params["classifier"] = cls

    if config.block_size_cond > 1:
        params["cond_classifier"] = {
            "ln_scale": jnp.ones((C,)),
            "ln_bias": jnp.zeros((C,)),
            "kernel": _dense_init(next(ks), (C, config.vocab_size_cond)),
            "bias": jnp.zeros((config.vocab_size_cond,)),
        }
    return params


def tok_emb_offsets(config: TransformerConfig) -> np.ndarray:
    return np.cumsum([0] + list(config.vocab_size[:-1])).astype(np.int32)


# ---------------------------------------------------------------------------
# int8 weight-only quantization (decode is weight-bandwidth bound: int8
# halves HBM traffic; dequantize fuses into the matmul so MXU still runs bf16)
# ---------------------------------------------------------------------------


class QuantizedWeight(NamedTuple):
    q: jax.Array  # int8, same shape as the original weight
    scale: jax.Array  # per-output-channel scale [..., 1, out]


def _quantize_weight(w: jax.Array) -> QuantizedWeight:
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale.astype(jnp.bfloat16))


def _mm(h: jax.Array, w) -> jax.Array:
    """h @ w for plain or int8-quantized weights ([L-stacked or not])."""
    if isinstance(w, QuantizedWeight):
        return (h @ w.q.astype(h.dtype)) * w.scale.astype(h.dtype)
    return h @ w


def quantize_stack_params(stack: dict) -> dict:
    out = {k: dict(v) for k, v in stack.items()}
    for name in ("wq", "wk", "wv", "wo"):
        out["attn"][name] = _quantize_weight(stack["attn"][name])
    for name in ("w1", "w2"):
        out["mlp"][name] = _quantize_weight(stack["mlp"][name])
    return out


def quantize_transformer_params(params: dict) -> dict:
    """Weight-only int8 for the decode-heavy tensors: body/head stacks and
    the classifier projection. Embeddings, norms, biases, mlps that feed
    embeddings stay bf16/fp32."""
    out = dict(params)
    out["body"] = quantize_stack_params(params["body"])
    out["head"] = quantize_stack_params(params["head"])
    cls = dict(params["classifier"])
    cls["kernel"] = _quantize_weight(params["classifier"]["kernel"])
    out["classifier"] = cls
    return out


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def layer_norm(x, scale, bias):
    """fp32 LayerNorm with ONE-PASS statistics: mean and E[x^2] are
    independent reduces, so XLA fuses them into a single multi-output
    reduce fusion. The textbook two-pass form (mean, then var(x - mean))
    chains two reduce fusions back-to-back; at decode shapes ([B, 1, C])
    each reduce fusion costs ~14us of serialized latency on v5e and
    LayerNorm was 39% of AR sampling time (trace, tools/trace_top_ops.py).
    E[x^2] - mean^2 in fp32 is exact enough for unit-scale activations
    (parity suite tolerances hold)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    msq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def gelu(x, version: str):
    if version == "v1":
        return jax.nn.gelu(x, approximate=False)  # torch F.gelu default (erf)
    return x * jax.nn.sigmoid(1.702 * x)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# attention stack: full causal forward (lax.scan over stacked layers)
# ---------------------------------------------------------------------------


def _attention(q, k, v, n_head, mask):
    """q,k,v: [B, T, C]; mask: [Tq, Tk] bool (True = attend). fp32 softmax."""
    B, Tq, C = q.shape
    Tk = k.shape[1]
    hs = C // n_head
    q = q.reshape(B, Tq, n_head, hs).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, n_head, hs).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, n_head, hs).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    att = att * (1.0 / np.sqrt(hs))
    att = jnp.where(mask[None, None], att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    return y.transpose(0, 2, 1, 3).reshape(B, Tq, C)


def _layer_body(x, p, cfg: StackConfig, mask, rng, deterministic):
    h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"])
    q = _mm(h, p["attn"]["wq"]) + p["attn"]["bq"]
    k = _mm(h, p["attn"]["wk"]) + p["attn"]["bk"]
    v = _mm(h, p["attn"]["wv"]) + p["attn"]["bv"]
    y = _attention(q, k, v, cfg.n_head, mask)
    y = _mm(y, p["attn"]["wo"]) + p["attn"]["bo"]
    if rng is not None:
        rng, r1, r2 = jax.random.split(rng, 3)
        y = _dropout(y, cfg.resid_pdrop, r1, deterministic)
    x = x + y
    h2 = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"])
    m = _mm(gelu(_mm(h2, p["mlp"]["w1"]) + p["mlp"]["b1"], cfg.gelu), p["mlp"]["w2"]) + p["mlp"]["b2"]
    if rng is not None:
        m = _dropout(m, cfg.resid_pdrop, r2, deterministic)
    return x + m


def stack_forward(
    params: dict,
    x: jax.Array,  # [B, T, C]
    cfg: StackConfig,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    T = x.shape[1]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    rngs = (
        jax.random.split(rng, cfg.n_layer)
        if (rng is not None and not deterministic)
        else None
    )

    def body(carry, inp):
        p = inp[0]
        r = inp[1] if rngs is not None else None
        return _layer_body(carry, p, cfg, mask, r, deterministic), None

    xs = (params,) if rngs is None else (params, rngs)
    out, _ = jax.lax.scan(body, x, xs)
    return out


# ---------------------------------------------------------------------------
# attention stack: cached decode step
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Fixed-size KV cache: k/v [n_layer, B, T_max, C].

    The head dimension stays MERGED in the last axis: TPU pads minor dims to
    128 lanes, so a [..., T, head_size=64] layout doubles every HBM cache
    touch. [B, T, C] keeps reads/writes unpadded (measured -31% per decode
    step on the 1.4B body at batch 100)."""

    k: jax.Array
    v: jax.Array


def init_kv_cache(cfg: StackConfig, batch: int, t_max: int, dtype=jnp.float32) -> KVCache:
    shape = (cfg.n_layer, batch, t_max, cfg.embed_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def stack_step(
    params: dict,
    x: jax.Array,  # [B, S, C] new tokens (S=1 decode, S=cond_len prefill)
    cache: KVCache,
    cur_len: jax.Array,  # int32 scalar: tokens already in cache
    cfg: StackConfig,
    window: Optional[int] = None,  # static: read only cache[:window] (KV BW)
) -> tuple[jax.Array, KVCache]:
    """One cached decode/prefill step for the whole stacked layer scan.

    HBM-traffic design: the layer scan never materializes an updated cache —
    attention is computed as (query x existing cache) + (query x new in-chunk
    rows) and only the tiny new K/V rows are emitted as scan outputs; the
    stacked cache is updated with ONE dynamic_update_slice afterwards.
    (Materializing per-layer updated caches costs ~2x the cache size in HBM
    writes per step and dominated decode time.) `window` statically bounds
    how much of the cache attention reads — the sampler buckets its position
    scan so early positions stream a fraction of the full cache.
    """
    B, S, C = x.shape
    n_head = cfg.n_head
    hs = C // n_head
    full_t_max = cache.k.shape[2]
    t_max = min(window, full_t_max) if window is not None else full_t_max
    scale = 1.0 / np.sqrt(hs)

    # past mask: cache positions strictly before cur_len
    past_mask_t1 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) < cur_len
    )  # [1, Tmax, 1] for the S=1 VPU path
    past_mask = past_mask_t1[..., 0][None]  # [1, 1, Tmax] for the matmul path
    chunk_mask = jnp.tril(jnp.ones((S, S), dtype=bool))

    def attention_decode(q, k, v, k_l, v_l):
        """S=1 path on the unpadded [B, T, C] cache: VPU broadcast-mul +
        segment-reduce scores at small B*T, MXU head-segment-matrix dot at
        large B*T (see _decode_attention_xla for the measured crossover;
        the stacked path serves long-sequence geometries where T alone
        pushes the VPU score stream past its ~290 GB/s ceiling)."""
        import os as _os

        mode = _os.environ.get("RQVAE_TPU_DECODE_ATTN", "auto").strip().lower()
        if mode not in ("vpu", "mxu"):
            mode = "mxu" if B * t_max >= 10000 else "vpu"
        if mode == "mxu":
            seg = _head_seg(C, n_head, k_l.dtype)
            # bf16 inputs MAC exactly on the MXU (fp32 accumulate); fp32
            # inputs need HIGHEST or the default bf16 truncation costs ~1e-2.
            prec = (
                jax.lax.Precision.HIGHEST
                if k_l.dtype == jnp.float32
                else None
            )
            q0 = q[:, 0, :]
            qseg = q0[:, :, None] * seg[None]
            s_past = (
                jnp.einsum(
                    "btc,bcn->btn", k_l, qseg,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                * scale
            )
            s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
            s_self = (
                jnp.einsum(
                    "bc,cn->bn", k[:, 0, :] * q0, seg,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                * scale
            )[:, None, :]
        else:
            prod = (k_l * q).reshape(B, t_max, n_head, hs)
            s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
            s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
            s_self = jnp.sum(
                (k * q).reshape(B, 1, n_head, hs), axis=-1, dtype=jnp.float32
            ) * scale
        s = jnp.concatenate([s_past, s_self], axis=1)  # [B, T+1, nh]
        p_att = jax.nn.softmax(s, axis=1)
        w_past = p_att[:, :t_max].astype(v_l.dtype)
        w_self = p_att[:, t_max:].astype(v.dtype)
        y = jnp.sum(v_l.reshape(B, t_max, n_head, hs) * w_past[..., None], axis=1)
        y = y + (v.reshape(B, 1, n_head, hs) * w_self[..., None])[:, 0]
        return y.reshape(B, 1, C)

    def attention_prefill(q, k, v, k_l, v_l):
        """S>1 path: standard batched-matmul attention over head views."""
        q4 = q.reshape(B, S, n_head, hs)
        k4 = k.reshape(B, S, n_head, hs)
        v4 = v.reshape(B, S, n_head, hs)
        kc = k_l.reshape(B, t_max, n_head, hs)
        vc = v_l.reshape(B, t_max, n_head, hs)
        att_past = jnp.einsum(
            "bshd,bthd->bhst", q4, kc, preferred_element_type=jnp.float32
        ) * scale
        att_past = jnp.where(past_mask[:, None], att_past, -jnp.inf)
        att_new = jnp.einsum(
            "bshd,bthd->bhst", q4, k4, preferred_element_type=jnp.float32
        ) * scale
        att_new = jnp.where(chunk_mask[None, None], att_new, -jnp.inf)
        att = jax.nn.softmax(
            jnp.concatenate([att_past, att_new], axis=-1), axis=-1
        ).astype(v.dtype)
        y = jnp.einsum("bhst,bthd->bshd", att[..., :t_max], vc) + jnp.einsum(
            "bhst,bthd->bshd", att[..., t_max:], v4
        )
        return y.reshape(B, S, C)

    attention = attention_decode if S == 1 else attention_prefill

    def body(carry, inp):
        x, = carry
        p, k_l, v_l = inp  # k_l/v_l: [B, Tmax, C]
        h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"])
        q = _mm(h, p["attn"]["wq"]) + p["attn"]["bq"]  # [B, S, C]
        k = _mm(h, p["attn"]["wk"]) + p["attn"]["bk"]
        v = _mm(h, p["attn"]["wv"]) + p["attn"]["bv"]
        y = attention(q, k, v, k_l, v_l)
        x = x + (_mm(y, p["attn"]["wo"]) + p["attn"]["bo"])
        h2 = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"])
        m = _mm(gelu(_mm(h2, p["mlp"]["w1"]) + p["mlp"]["b1"], cfg.gelu), p["mlp"]["w2"]) + p["mlp"]["b2"]
        return (x + m,), (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

    (out,), (k_rows, v_rows) = jax.lax.scan(
        body, (x,), (params, cache.k[:, :, :t_max], cache.v[:, :, :t_max])
    )
    # single stacked cache write: [L, B, S, C] into [L, B, Tmax, C]
    new_k = jax.lax.dynamic_update_slice(cache.k, k_rows, (0, 0, cur_len, 0))
    new_v = jax.lax.dynamic_update_slice(cache.v, v_rows, (0, 0, cur_len, 0))
    return out, KVCache(k=new_k, v=new_v)


# ---------------------------------------------------------------------------
# attention stack: UNROLLED decode (one cache array pair per layer)
# ---------------------------------------------------------------------------
#
# The stacked-layer scan pays a dynamic-slice COPY of each layer's [B, T, C]
# cache slice per step (profiled at ~35us/layer-step on v5e — ~18% of
# decode-layer time; XLA cannot fuse the scan xs slice into the attention
# consumers). Unrolling the 42 layers with SEPARATE per-layer cache arrays
# removes the slicing entirely: measured 5.76 -> 5.19 ms/sample on the 1.4B
# body at bs100 (tools/perf_probe.py). Params stay stacked [L, ...] in the
# checkpoint; `split_layer_params` takes trace-time per-layer views (XLA
# hoists the gathers out of the position scan).


def split_layer_params(params: dict, cfg: StackConfig, fuse_qkv: bool = True) -> list:
    """Per-layer param trees from the stacked [L, ...] layout.

    fuse_qkv=True additionally concatenates wq/wk/wv into one [C, 3C]
    projection per layer (one matmul instead of three at decode's small
    M=batch; measured -3% on the 1.4B body). Works for int8
    QuantizedWeights too (per-output-channel scales concatenate)."""
    out = []
    for i in range(cfg.n_layer):
        lp = jax.tree.map(lambda a: a[i], params)
        if fuse_qkv:
            attn = dict(lp["attn"])
            ws = [attn.pop(n) for n in ("wq", "wk", "wv")]
            if isinstance(ws[0], QuantizedWeight):
                attn["wqkv"] = QuantizedWeight(
                    q=jnp.concatenate([w.q for w in ws], axis=-1),
                    scale=jnp.concatenate([w.scale for w in ws], axis=-1),
                )
            else:
                attn["wqkv"] = jnp.concatenate(ws, axis=-1)
            attn["bqkv"] = jnp.concatenate(
                [attn.pop(n) for n in ("bq", "bk", "bv")], axis=-1
            )
            lp = dict(lp)
            lp["attn"] = attn
        out.append(lp)
    return out


def init_unrolled_kv_cache(cfg: StackConfig, batch: int, t_max: int, dtype=jnp.float32):
    """Tuple of per-layer (k, v) caches, each [B, T_max, C]."""
    shape = (batch, t_max, cfg.embed_dim)
    return tuple(
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(cfg.n_layer)
    )


def _use_pallas_decode_attn(
    t_max: int, C: int, n_head: int, dtype, batch: int | None = None
) -> bool:
    """Decode-attention backend selection (trace-time, static).

    The Pallas fused kernel (ops/attention_kernel.py) streams the KV cache
    at ~740 GB/s (91% of the 819 GB/s paper peak) vs ~560-620 for the XLA
    formulations (tools/exp_pallas_attn.py, 24-layer HBM-resident chain).
    End-to-end it wins only at large batch (bs500: AR 4.94 -> 4.71 with
    sublane-aligned phase windows; bs200: 5.02 vs 4.93 for mxu — crossover
    between 200 and 500): at small batch the decode loop sits at an
    aggregate ~600 GB/s equilibrium and the locally-faster kernel just
    shifts time into weight-prefetch waits (traced: +55ms/iter of sync
    slice-done at bs100). The tiny depth-head caches (T=4) always stay on
    XLA. RQVAE_TPU_DECODE_ATTN: 'pallas' forces (where legal), 'vpu'/'mxu'
    force the XLA paths, default 'auto' uses pallas for windows >= 32 and
    batch >= 300 on TPU backends.
    """
    import os as _os

    mode = _os.environ.get("RQVAE_TPU_DECODE_ATTN", "auto").strip().lower()
    legal = (
        t_max >= 16
        and C % n_head == 0
        and C % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
        and jax.default_backend() == "tpu"
    )
    if mode == "pallas":
        return legal
    if mode in ("vpu", "mxu"):
        return False
    return legal and t_max >= 32 and (batch is None or batch >= 300)


def _use_pallas_decode_dense(C: int, dtype, batch: int) -> bool:
    """Dense-half backend selection for the S=1 decode step (trace-time).

    'pallas' routes LN1+QKV and proj+LN2+MLP through the weight-streaming
    kernels in ops/decode_layer_kernel.py (wqkv/w1/w2 chunks ride the
    pallas grid DMA pipeline while the [B, C] activation block stays in
    VMEM). Measured end-to-end at bs100 (1.4B, bf16): 7.75 -> 7.64
    ms/sample (AR 6.20 -> 6.10); the 3x microbench win (tools/
    exp_mlp_kernel.py: 213 -> 70 us/layer) is mostly absorbed by XLA's
    weight prefetch already overlapping in-program. Combining with the
    Pallas attention kernel at bs100 REGRESSES (8.27 — adjacent opaque
    custom calls cannot overlap each other's DMA), so dense-auto engages
    only where the attention stays on XLA (batch < 150); the bs200/bs500
    operating points keep their measured pure-XLA-dense configurations.
    RQVAE_TPU_DECODE_DENSE: 'pallas' forces, 'xla' forces the
    fused-emitter path, 'auto' follows this measured policy.
    """
    import os as _os

    mode = _os.environ.get("RQVAE_TPU_DECODE_DENSE", "auto").strip().lower()
    legal = (
        C % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
        and jax.default_backend() == "tpu"
    )
    if mode == "pallas":
        return legal
    if mode == "xla":
        return False
    return legal and batch < 150


def _head_seg(C: int, n_head: int, dtype):
    """Constant 0/1 head-segment matrix seg[c, h] = (c // hs == h)."""
    hs = C // n_head
    col = np.arange(C) // hs
    return jnp.asarray(
        (col[:, None] == np.arange(n_head)[None, :]), dtype=dtype
    )


def _decode_attention_xla(q, k, v, k_l, v_l, cur_len, n_head):
    """S=1 attention against one layer's [B, T, C] cache (same math as
    stack_step's attention_decode).

    Two formulations, selected by RQVAE_TPU_DECODE_ATTN (trace-time):
      'vpu': per-head scores via broadcast-mul + segment reduce — wins at
        small batch (bs100: 6.18 vs 6.48 AR ms/sample, 1.4B).
      'mxu': scores as one batched MXU dot against the 0/1 head-segment
        matrix (cache read once, fp32 MAC, no lane-padded hs-minor
        reshapes) at the cost of materializing a [B, C, nh] q-segment
        operand. The VPU score path streams through the ~290 GB/s
        elementwise ceiling and scales with T*B, while qseg scales only
        with B — measured wins at bs200 (4.93 vs 5.18) and bs500
        (4.94 vs 5.12).
      default 'auto': mxu for B >= 150, vpu below.
    RQVAE_TPU_DECODE_ATTN_V='mxu' additionally routes the V-weighted sum
    through segment dots — measured SLOWER everywhere (bs500: 5.40 vs
    4.94); kept for experiments only.
    """
    B, _, C = q.shape
    t_max = k_l.shape[1]
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    past_mask_t1 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) < cur_len
    )
    import os as _os

    mode = _os.environ.get("RQVAE_TPU_DECODE_ATTN", "auto").strip().lower()
    if mode not in ("vpu", "mxu"):
        mode = "mxu" if B >= 150 else "vpu"
    if mode == "mxu":
        seg = _head_seg(C, n_head, k_l.dtype)  # [C, nh]
        # bf16 inputs MAC exactly on the MXU (fp32 accumulate); fp32 inputs
        # need HIGHEST or the default bf16 truncation costs ~1e-2.
        prec = (
            jax.lax.Precision.HIGHEST if k_l.dtype == jnp.float32 else None
        )
        q0 = q[:, 0, :]
        qseg = q0[:, :, None] * seg[None]  # exact: seg is 0/1
        s_past = (
            jnp.einsum(
                "btc,bcn->btn", k_l, qseg,
                preferred_element_type=jnp.float32, precision=prec,
            )
            * scale
        )
        s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
        s_self = (
            jnp.einsum(
                "bc,cn->bn", k[:, 0, :] * q0, seg,
                preferred_element_type=jnp.float32, precision=prec,
            )
            * scale
        )[:, None, :]
    else:
        prod = (k_l * q).reshape(B, t_max, n_head, hs)
        s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
        s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
        s_self = jnp.sum(
            (k * q).reshape(B, 1, n_head, hs), axis=-1, dtype=jnp.float32
        ) * scale
    s = jnp.concatenate([s_past, s_self], axis=1)
    p_att = jax.nn.softmax(s, axis=1)
    w_past = p_att[:, :t_max].astype(v_l.dtype)
    w_self = p_att[:, t_max:].astype(v.dtype)
    if _os.environ.get("RQVAE_TPU_DECODE_ATTN_V", "").strip().lower() == "mxu":
        seg = _head_seg(C, n_head, v_l.dtype)
        vprec = (
            jax.lax.Precision.HIGHEST if v_l.dtype == jnp.float32 else None
        )
        wseg = jnp.einsum(
            "btn,cn->btc", w_past, seg, precision=vprec
        )  # [B, T, C] per-lane w
        y = jnp.sum(v_l * wseg, axis=1)
        y = y + v[:, 0, :] * jnp.einsum(
            "bn,cn->bc", w_self[:, 0], seg, precision=vprec
        )
    else:
        y = jnp.sum(v_l.reshape(B, t_max, n_head, hs) * w_past[..., None], axis=1)
        y = (
            y + (v.reshape(B, 1, n_head, hs) * w_self[..., None])[:, 0]
        ).reshape(B, C)
    return y[:, None, :]


def stack_step_unrolled(
    layer_params: list,
    x: jax.Array,  # [B, S, C]
    caches,  # tuple of per-layer (k [B, T, C], v)
    cur_len: jax.Array,
    cfg: StackConfig,
    window: Optional[int] = None,  # static: attention reads cache[:window]
):
    """Unrolled cached decode/prefill step. Semantically identical to
    `stack_step` on the stacked cache (asserted in tests); faster at decode
    because no per-layer cache slices are materialised. A static `window`
    (>= cur_len + 1 for every step it serves) bounds how much of each cache
    attention streams — the sampler phases its position scan so early
    positions read a fraction of the full cache."""
    if not layer_params:  # 0-layer stacks (VQGAN-equivalent d=1: no head)
        return x, caches
    B, S, C = x.shape
    n_head = cfg.n_head
    hs = C // n_head
    t_max = caches[0][0].shape[1]
    if window is not None:
        t_max = min(window, t_max)
    scale = 1.0 / np.sqrt(hs)

    if S > 1:
        past_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_max), 3) < cur_len
        )
        chunk_mask = jnp.tril(jnp.ones((S, S), dtype=bool))

    dense_mode = S == 1 and _use_pallas_decode_dense(C, x.dtype, B)

    new_caches = []
    for lp, (k_l, v_l) in zip(layer_params, caches):
        dense_ok = (
            dense_mode
            and "wqkv" in lp["attn"]
            and not isinstance(lp["attn"]["wqkv"], QuantizedWeight)
        )
        if dense_ok:
            from rqvae_tpu.ops import decode_layer_kernel as _DK

            qkv = _DK.fused_ln_qkv(
                x[:, 0, :], lp["ln1"]["scale"], lp["ln1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"],
            )[:, None, :]
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
            if "wqkv" in lp["attn"]:
                qkv = _mm(h, lp["attn"]["wqkv"]) + lp["attn"]["bqkv"]
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = _mm(h, lp["attn"]["wq"]) + lp["attn"]["bq"]
                k = _mm(h, lp["attn"]["wk"]) + lp["attn"]["bk"]
                v = _mm(h, lp["attn"]["wv"]) + lp["attn"]["bv"]
        if S == 1:
            if _use_pallas_decode_attn(t_max, C, n_head, k_l.dtype, batch=B):
                from rqvae_tpu.ops import attention_kernel as _AK

                # round the window up to the sublane tile so Mosaic gets an
                # aligned cache block; rows in [cur_len, W) are masked out
                sub = 16 if k_l.dtype == jnp.bfloat16 else 8
                W = min(k_l.shape[1], -(-t_max // sub) * sub)
                y = _AK.decode_attention(
                    q[:, 0, :], k[:, 0, :], v[:, 0, :], k_l, v_l,
                    cur_len, n_head, t_window=W,
                )[:, None, :]
            else:
                y = _decode_attention_xla(
                    q, k, v, k_l[:, :t_max], v_l[:, :t_max], cur_len, n_head
                )
        else:
            q4 = q.reshape(B, S, n_head, hs)
            k4 = k.reshape(B, S, n_head, hs)
            v4 = v.reshape(B, S, n_head, hs)
            kc = k_l[:, :t_max].reshape(B, t_max, n_head, hs)
            vc = v_l[:, :t_max].reshape(B, t_max, n_head, hs)
            att_past = jnp.einsum(
                "bshd,bthd->bhst", q4, kc, preferred_element_type=jnp.float32
            ) * scale
            att_past = jnp.where(past_mask, att_past, -jnp.inf)
            att_new = jnp.einsum(
                "bshd,bthd->bhst", q4, k4, preferred_element_type=jnp.float32
            ) * scale
            att_new = jnp.where(chunk_mask[None, None], att_new, -jnp.inf)
            att = jax.nn.softmax(
                jnp.concatenate([att_past, att_new], axis=-1), axis=-1
            ).astype(v.dtype)
            y = jnp.einsum("bhst,bthd->bshd", att[..., :t_max], vc) + jnp.einsum(
                "bhst,bthd->bshd", att[..., t_max:], v4
            )
            y = y.reshape(B, S, C)
        if dense_ok and not isinstance(lp["attn"]["wo"], QuantizedWeight):
            x = _DK.fused_proj_mlp(
                x[:, 0, :], y[:, 0, :],
                lp["attn"]["wo"], lp["attn"]["bo"],
                lp["ln2"]["scale"], lp["ln2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"],
                lp["mlp"]["w2"], lp["mlp"]["b2"],
                gelu_version=cfg.gelu,
            )[:, None, :]
        else:
            x2 = x + (_mm(y, lp["attn"]["wo"]) + lp["attn"]["bo"])
            h2 = layer_norm(x2, lp["ln2"]["scale"], lp["ln2"]["bias"])
            m = _mm(gelu(_mm(h2, lp["mlp"]["w1"]) + lp["mlp"]["b1"], cfg.gelu), lp["mlp"]["w2"]) + lp["mlp"]["b2"]
            x = x2 + m
        new_caches.append(
            (
                jax.lax.dynamic_update_slice(
                    k_l, k.astype(k_l.dtype), (0, cur_len, 0)
                ),
                jax.lax.dynamic_update_slice(
                    v_l, v.astype(v_l.dtype), (0, cur_len, 0)
                ),
            )
        )
    return x, tuple(new_caches)


# ---------------------------------------------------------------------------
# embeddings / classifier
# ---------------------------------------------------------------------------


def tuple_tok_emb(params, config: TransformerConfig, xs: jax.Array) -> jax.Array:
    """Token embedding over per-depth dictionaries: xs [..., D] int ->
    [..., D, C]. Shared mode uses one table; tuple mode offsets into a
    concatenated table (reference primitives.py:65-72)."""
    if config.shared_tok_emb:
        return jnp.take(params["tok_emb"], xs, axis=0)
    offsets = jnp.asarray(tok_emb_offsets(config))
    return jnp.take(params["tok_emb"], xs + offsets, axis=0)


def apply_logit_mask(logits: jax.Array, config: TransformerConfig) -> jax.Array:
    """-inf padding of invalid vocab tails when codebook sizes differ
    (reference primitives.py:75-89). logits: [..., D, Vmax]."""
    if not config.heterogeneous_vocab:
        return logits
    vmax = config.vocab_size_max
    col = jax.lax.broadcasted_iota(jnp.int32, (config.depth, vmax), 1)
    valid = col < jnp.asarray(config.vocab_size)[:, None]
    return jnp.where(valid, logits, -jnp.inf)


def classifier_apply(params, config: TransformerConfig, h: jax.Array, depth_idx=None):
    """h: [..., D, C] (full) or [..., C] with depth_idx (decode step).
    LayerNorm -> (shared Dense | per-depth BatchLinear) -> logit mask."""
    cls = params["classifier"]
    h = layer_norm(h, cls["ln_scale"], cls["ln_bias"])
    if config.shared_cls_emb:
        logits = _mm(h, cls["kernel"]) + cls["bias"]
        if depth_idx is None:
            return apply_logit_mask(logits, config)
        return logits
    if depth_idx is None:
        w = cls["kernel"]
        if isinstance(w, QuantizedWeight):
            logits = (
                jnp.einsum("...dc,dcv->...dv", h, w.q.astype(h.dtype)) * w.scale.astype(h.dtype)
                + cls["bias"]
            )
        else:
            logits = jnp.einsum("...dc,dcv->...dv", h, w) + cls["bias"]
        return apply_logit_mask(logits, config)
    w = cls["kernel"]
    if isinstance(w, QuantizedWeight):
        w = QuantizedWeight(q=w.q[depth_idx], scale=w.scale[depth_idx])
        logits = _mm(h, w) + cls["bias"][depth_idx]
    else:
        logits = h @ w[depth_idx] + cls["bias"][depth_idx]
    if config.heterogeneous_vocab:
        logits = jnp.where(
            jnp.arange(config.vocab_size_max) < config.vocab_size[depth_idx],
            logits,
            -jnp.inf,
        )
    return logits


def input_embed(params, config: TransformerConfig, xs, xs_emb):
    """Body-side per-depth token embeddings [B, T, D, C]."""
    if config.input_emb_vqvae:
        return xs_emb @ params["input_mlp"]["kernel"] + params["input_mlp"]["bias"]
    return tuple_tok_emb(params, config, xs)


def head_embed(params, config: TransformerConfig, xs, xs_emb):
    """Head-side per-depth context embeddings [B, T, D, C] (with cumsum over
    depth when configured — transformers.py:156-164)."""
    if config.head_emb_vqvae:
        e = xs_emb
        if config.cumsum_depth_ctx:
            e = jnp.cumsum(e, axis=-2)
        return e @ params["head_mlp"]["kernel"] + params["head_mlp"]["bias"]
    return tuple_tok_emb(params, config, xs)


# ---------------------------------------------------------------------------
# teacher-forced forward
# ---------------------------------------------------------------------------


def forward(
    params: dict,
    config: TransformerConfig,
    xs: jax.Array,  # [B, H, W, D] int codes
    cond: Optional[jax.Array] = None,  # [B, block_size_cond] int
    xs_emb: Optional[jax.Array] = None,  # [B, H*W, D, input_embed_dim]
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """Teacher-forced forward (reference transformers.py:113-188).

    Returns seq_logits [B, H, W, D, Vmax] (and cond_logits
    [B, cond_len-1, Vc] when block_size_cond > 1)."""
    B, H, W, D = xs.shape
    xs_flat = xs.reshape(B, H * W, D)
    seq_len = H * W
    cond_len = config.block_size_cond
    if cond is None:
        cond = jnp.zeros((B, cond_len), jnp.int32)
    else:
        cond = cond.reshape(B, cond_len)

    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    in_emb = input_embed(params, config, xs_flat, xs_emb)  # [B, T, D, C]
    conds_emb = (
        jnp.take(params["cond_emb"], cond, axis=0)
        + params["pos_emb_cond"][:, :cond_len]
    )
    xs_sum = jnp.sum(in_emb, axis=-2) + params["pos_emb_hw"][:, :seq_len]
    latents = jnp.concatenate([conds_emb, xs_sum[:, :-1]], axis=1)
    latents = _dropout(latents, config.embd_pdrop, rngs[0], deterministic)

    h = stack_forward(params["body"], latents, config.body, rngs[1], deterministic)
    spatial_ctx = h[:, cond_len - 1 :]

    cond_logits = None
    if cond_len > 1:
        cc = params["cond_classifier"]
        cond_ctx = layer_norm(h[:, : cond_len - 1], cc["ln_scale"], cc["ln_bias"])
        cond_logits = cond_ctx @ cc["kernel"] + cc["bias"]

    depth_ctx = head_embed(params, config, xs_flat, xs_emb)  # [B, T, D, C]
    depth_full = jnp.concatenate(
        [spatial_ctx[:, :, None, :], depth_ctx[:, :, :-1, :]], axis=-2
    )
    depth_full = depth_full.reshape(B * seq_len, D, -1) + params["pos_emb_d"][:, :D]

    head_out = stack_forward(
        params["head"], depth_full, config.head, rngs[2], deterministic
    )
    head_out = head_out.reshape(B, H, W, D, -1)
    seq_logits = classifier_apply(params, config, head_out)

    if cond_len > 1:
        return seq_logits, cond_logits
    return seq_logits


# ---------------------------------------------------------------------------
# losses (reference transformers.py:371-410; optimizer/loss.py:75-84)
# ---------------------------------------------------------------------------


def soft_target_cross_entropy(logits, soft_targets, reduction="mean"):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # match logits' vocab dim (soft targets cover the true vocab only)
    loss = -jnp.sum(soft_targets * logp[..., : soft_targets.shape[-1]], axis=-1)
    return jnp.mean(loss) if reduction == "mean" else loss


def cross_entropy(logits, targets, reduction="mean"):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(loss) if reduction == "mean" else loss


def compute_loss(logits, targets, use_soft_target: bool = False):
    logits = logits.reshape(-1, logits.shape[-1])
    if use_soft_target:
        return soft_target_cross_entropy(logits, targets.reshape(-1, targets.shape[-1]))
    return cross_entropy(logits, targets.reshape(-1))


def compute_cond_loss(cond_logits, conds):
    assert cond_logits.shape[1] == conds.shape[1] - 1
    targets = conds[:, 1:]
    return cross_entropy(
        cond_logits.reshape(-1, cond_logits.shape[-1]), targets.reshape(-1)
    )


def compute_codebook_loss(logits, targets, use_soft_target: bool = False):
    """Per-depth xent for logging (transformers.py:393-410)."""
    D = logits.shape[-2]
    logits = logits.reshape(-1, logits.shape[-1])
    if use_soft_target:
        tok = soft_target_cross_entropy(
            logits, targets.reshape(-1, targets.shape[-1]), reduction="none"
        )
    else:
        tok = cross_entropy(logits, targets.reshape(-1), reduction="none")
    return jnp.mean(tok.reshape(-1, D), axis=0)
