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
# decode dispatch policy
# ---------------------------------------------------------------------------
#
# The decode path ships several mathematically-identical formulations whose
# winner depends on the operating point (measured policy table below, from
# tools/exp_pallas_attn.py / exp_mlp_kernel.py / perf_probe.py; see
# COVERAGE.md "round-2/3 perf"). ALL selection state lives in this one
# DecodePolicy value: it is resolved from the environment exactly once at
# the `sampling.sample()` boundary (a plain Python wrapper), then threaded
# through the jitted implementation as a static argument — so flipping an
# env var between calls takes effect predictably (new static key -> new
# compile), and nothing inside model internals reads os.environ.
#
# Measured auto policy (1.4B cIN256 geometry, v5e, bf16):
#   attention:  pallas fused kernel (with in-kernel cache write,
#               ops/attention_kernel.py::decode_attention_update) at
#               EVERY batch where legal and t_max >= 32 — measured
#               (tools/exp_attn_crossover.py, AR ms/sample vs best XLA):
#               bs100 5.39/6.08, bs150 4.41/7.72, bs200 3.87/4.92, bs250
#               3.88/4.37, bs500 3.71/4.94. (Before the fused cache
#               write the kernel only won >= bs300 — the XLA
#               dynamic-update-slice cache write it now absorbs cost
#               ~96us/layer at bs500.) Fallbacks when illegal: vpu
#               (broadcast-mul scores) below bs150, mxu (head-segment
#               matrix dot) above. Stacked-cache path (long sequences):
#               mxu when B*t_max >= 10000 else vpu. Tiny head caches
#               (T < 16) always XLA.
#   dense:      pallas weight-streaming kernels below bs150 when the
#               attention stays on XLA (adjacent Pallas custom calls
#               serialize each other's DMA), XLA fusions otherwise.
#   unroll:     per-layer python-unrolled caches for HW <= 128; stacked
#               lax.scan cache beyond (XLA stops aliasing many separate
#               cache buffers in place at long HW).
#   phases:     2 static cache-window phases.


class DecodePolicy(NamedTuple):
    """Static decode-path backend selection (hashable: safe as a jit key).

    Fields may stay 'auto': resolution to a concrete backend is a pure
    function of the call-site geometry (resolve_attn_backend /
    resolve_dense_backend), so an 'auto' policy is still a deterministic
    jit key. `unroll=None` means "HW <= 128 heuristic".
    """

    attn: str = "auto"  # 'auto' | 'vpu' | 'mxu' | 'pallas'
    attn_v: str = "vpu"  # 'vpu' | 'mxu' (mxu measured slower; experiments)
    dense: str = "auto"  # 'auto' | 'xla' | 'pallas'
    unroll: Optional[bool] = None
    phases: int = 2
    exact_sample: bool = False  # reference-exact top-k tie semantics
    # int8 BODY KV cache (unrolled path only): halves the cache HBM stream;
    # per-(token, head) scales fold into the [B, T, nh] score/weight
    # matrices (ops/attention_kernel.py q8 section). Opt-in — quantization
    # perturbs the sampled distribution (bounded by tests/test_decode_modes).
    kv_q8: bool = False
    # fold the attention OUTPUT PROJECTION + residual + LN2 into the q8
    # fused-write attention kernel (decode_attention_q8_update_wo):
    # boundary-reduction experiment — removes the XLA wo dot, the ln2
    # convert_reduce fusion and the y round-trip per layer. Requires kv_q8
    # + the pallas fused-write path; single-chip only.
    attn_wo: bool = False
    # run Pallas kernels in interpret mode (slow, any backend). NOT
    # env-resolved: set only by CPU-mesh tests and multichip dryruns that
    # must EXECUTE the kernel paths without a real TPU.
    interpret: bool = False


DEFAULT_POLICY = DecodePolicy()


def decode_policy_from_env() -> DecodePolicy:
    """Read the RQVAE_TPU_* knobs into a DecodePolicy. Called ONLY by
    non-jitted entry points (sampling.sample, benches); everything below
    takes the policy as an argument."""
    import os as _os
    import warnings

    def _get(name, default=""):
        return _os.environ.get(name, default).strip().lower()

    attn = _get("RQVAE_TPU_DECODE_ATTN", "auto") or "auto"
    if attn not in ("auto", "vpu", "mxu", "pallas"):
        warnings.warn(f"RQVAE_TPU_DECODE_ATTN={attn!r} not understood; using auto")
        attn = "auto"
    attn_v = "mxu" if _get("RQVAE_TPU_DECODE_ATTN_V") == "mxu" else "vpu"
    dense = _get("RQVAE_TPU_DECODE_DENSE", "auto") or "auto"
    if dense not in ("auto", "xla", "pallas", "mega"):
        warnings.warn(f"RQVAE_TPU_DECODE_DENSE={dense!r} not understood; using auto")
        dense = "auto"
    unroll_env = _get("RQVAE_TPU_SAMPLE_UNROLL")
    if unroll_env in ("1", "true", "yes"):
        unroll = True
    elif unroll_env in ("0", "false", "no"):
        unroll = False
    else:
        if unroll_env:
            warnings.warn(
                f"RQVAE_TPU_SAMPLE_UNROLL={unroll_env!r} not understood; "
                "using the HW<=128 heuristic"
            )
        unroll = None
    try:
        phases = int(_os.environ.get("RQVAE_TPU_SAMPLE_PHASES", "2") or 2)
    except ValueError:
        warnings.warn("RQVAE_TPU_SAMPLE_PHASES not an int; using 2")
        phases = 2
    exact = _get("RQVAE_TPU_SAMPLE_EXACT") in ("1", "true", "yes")
    kv_q8 = _get("RQVAE_TPU_KV_Q8") in ("1", "true", "yes")
    attn_wo = _get("RQVAE_TPU_ATTN_WO") in ("1", "true", "yes")
    return DecodePolicy(
        attn=attn, attn_v=attn_v, dense=dense, unroll=unroll,
        phases=phases, exact_sample=exact, kv_q8=kv_q8, attn_wo=attn_wo,
    )


def sublane_tile(dtype) -> int:
    """Mosaic second-minor tile: 32 rows int8, 16 rows bf16, 8 rows fp32."""
    if dtype == jnp.int8:
        return 32
    return 16 if dtype == jnp.bfloat16 else 8


def _pallas_attn_legal(
    t_max: int, C: int, n_head: int, dtype, cache_T: int,
    interpret: bool = False,
) -> bool:
    """Whether ops/attention_kernel.decode_attention can serve this geometry.

    Beyond shape/dtype/backend constraints, the kernel's cache window
    W = min(cache_T, round_up(t_max, sublane)) must itself be
    sublane-aligned or Mosaic rejects the block shape — guaranteed when the
    cache allocation is tile-aligned (the sampler rounds its unrolled cache
    T up; extra rows are masked by cur_len) or when the rounded window fits
    inside the cache. `interpret` waives the TPU-backend requirement (CPU
    tests / dryruns execute the kernel in interpret mode)."""
    sub = sublane_tile(dtype)
    w_aligned = (-(-t_max // sub) * sub <= cache_T) or (cache_T % sub == 0)
    return (
        t_max >= 16
        and C % n_head == 0
        and C % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
        and w_aligned
        and (jax.default_backend() == "tpu" or interpret)
    )


def resolve_attn_backend(
    mode: str,
    *,
    batch: int,
    t_max: int,
    C: int,
    n_head: int,
    dtype,
    cache_T: int,
    stacked: bool = False,
    mesh=None,
    interpret: bool = False,
) -> str:
    """THE decode-attention policy table -> concrete backend
    ('vpu' | 'mxu' | 'pallas'). See the module-level policy notes for the
    measurements behind each threshold.

    With a tensor-parallel `mesh` the kernel runs PER SHARD under
    shard_map (stack_step_unrolled), so legality and the vpu/mxu
    crossovers apply to the per-device geometry: C and n_head divided
    over the 'model' axis, batch over 'data'. Non-dividing geometries
    make the kernel illegal (the shard_map specs would not partition)."""
    if mode in ("vpu", "mxu"):
        return mode
    divides = True
    if mesh is not None:
        from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        n_model = mesh.shape.get(MODEL_AXIS, 1)
        n_data = mesh.shape.get(DATA_AXIS, 1)
        divides = (
            n_head % n_model == 0
            and C % n_model == 0
            and batch % n_data == 0
        )
        if divides:
            C //= n_model
            n_head //= n_model
        batch = max(1, batch // n_data)
    legal = (
        (not stacked)
        and divides
        and _pallas_attn_legal(t_max, C, n_head, dtype, cache_T, interpret)
    )
    if mode == "pallas" and legal:
        return "pallas"
    if stacked:
        return "mxu" if batch * t_max >= 10000 else "vpu"
    if mode != "pallas" and legal and t_max >= 32:
        # with the fused in-kernel cache write (decode_attention_update)
        # the kernel wins at EVERY measured batch, not just >= 300:
        # exp_attn_crossover.py AR ms/sample vs the best XLA backend —
        # bs100 5.39 vs 6.08(vpu), bs150 4.41 vs 7.72(mxu), bs200 3.87 vs
        # 4.92, bs250 3.88 vs 4.37, bs500 3.71 vs 4.94
        return "pallas"
    return "mxu" if batch >= 150 else "vpu"


def resolve_dense_backend(
    mode: str, *, batch: int, C: int, dtype, attn_backend: str = "vpu",
    interpret: bool = False,
) -> str:
    """Dense-half policy table -> 'xla' | 'pallas' (weight-streaming
    kernels, ops/decode_layer_kernel.py) | 'mega' (whole-layer fused
    kernel, ops/decode_megakernel.py — experimental, forced only).

    'auto' resolves to the weight-streaming kernels ONLY when the
    attention stays on XLA: adjacent Pallas custom calls serialize each
    other's DMA (measured r2; re-measured r3 with the fused-cache-write
    attention kernel — bs100 AR 5.39 with dense=xla vs 5.98 with both
    kernels)."""
    legal = (
        C % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
        and (jax.default_backend() == "tpu" or interpret)
    )
    if mode == "mega":
        return "mega" if legal else "xla"
    if mode == "pallas":
        return "pallas" if legal else "xla"
    if mode == "xla":
        return "xla"
    return "pallas" if (legal and batch < 150 and attn_backend != "pallas") else "xla"


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
    remat: bool = False,
) -> jax.Array:
    T = x.shape[1]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    rngs = (
        jax.random.split(rng, cfg.n_layer)
        if (rng is not None and not deterministic)
        else None
    )

    # remat: recompute each layer's activations in the backward pass instead
    # of saving them — under the layer lax.scan this caps the saved state at
    # ONE layer boundary [B, T, C] per layer instead of every intermediate
    # (qkv/att/mlp hidden), trading ~1 extra forward of FLOPs for ~10x less
    # activation HBM (the big-batch stage-2 lever; reference equivalent is
    # torch checkpointing the reference never shipped for stage 2)
    # prevent_cse=False: under lax.scan the loop boundary already blocks the
    # CSE that prevent_cse guards against, so the default's optimization
    # barriers only cost (JAX docs' recommended setting for scan-over-layers)
    layer_fn = (
        jax.checkpoint(_layer_body, static_argnums=(2, 5), prevent_cse=False)
        if remat
        else _layer_body
    )

    def body(carry, inp):
        p = inp[0]
        r = inp[1] if rngs is not None else None
        return layer_fn(carry, p, cfg, mask, r, deterministic), None

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
    attn_mode: str = "auto",  # policy.attn ('pallas' falls back to XLA here)
    mesh=None,  # tensor-parallel Mesh: crossovers apply per-device
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
        large B*T (see resolve_attn_backend for the measured crossover;
        the stacked path serves long-sequence geometries where T alone
        pushes the VPU score stream past its ~290 GB/s ceiling)."""
        mode = resolve_attn_backend(
            attn_mode, batch=B, t_max=t_max, C=C, n_head=n_head,
            dtype=k_l.dtype, cache_T=full_t_max, stacked=True, mesh=mesh,
        )
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


def init_unrolled_kv_cache_q8(cfg: StackConfig, batch: int, t_max: int):
    """Tuple of per-layer int8 (kq, k_scale, vq, v_scale) caches:
    values [B, T, C] int8, per-(token, head) scales [B, T, n_head] bf16.
    t_max should be rounded to the int8 sublane tile (32) by the caller so
    the Pallas q8 kernel gets aligned cache blocks."""
    shape = (batch, t_max, cfg.embed_dim)
    sshape = (batch, t_max, cfg.n_head)
    return tuple(
        (
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.bfloat16),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.bfloat16),
        )
        for _ in range(cfg.n_layer)
    )


def _head_seg(C: int, n_head: int, dtype):
    """Constant 0/1 head-segment matrix seg[c, h] = (c // hs == h)."""
    hs = C // n_head
    col = np.arange(C) // hs
    return jnp.asarray(
        (col[:, None] == np.arange(n_head)[None, :]), dtype=dtype
    )


def _pallas_attn_sharded(
    q2, k2, v2, k_l, v_l, cur_len, n_head, W, mesh, interpret, fused
):
    """Run the Pallas decode-attention kernel per tensor-parallel shard.

    GSPMD has no partition rule for a pallas_call, so the TP sampler drops
    into shard_map here: each device gets its Megatron head group —
    q/k/v rows [B_local, C/tp], cache block [B_local, T, C/tp] — which is
    the kernel's native layout (heads never mix; the fused cache write
    aliases the local block in place). cur_len is replicated."""
    from jax.sharding import PartitionSpec as P

    from rqvae_tpu.ops import attention_kernel as _AK
    from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    nh_local = n_head // n_model
    row = P(DATA_AXIS, MODEL_AXIS)
    cch = P(DATA_AXIS, None, MODEL_AXIS)
    kernel = _AK.decode_attention_update if fused else _AK.decode_attention

    def f(qs, ks, vs, kl, vl, cl):
        return kernel(
            qs, ks, vs, kl, vl, cl, nh_local, t_window=W, interpret=interpret
        )

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(row, row, row, cch, cch, P()),
        out_specs=(row, cch, cch) if fused else row,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(q2, k2, v2, k_l, v_l, cur_len)


def _pallas_attn_q8_sharded(
    q2, k2, v2, kq_l, ks_l, vq_l, vs_l, cur_len, n_head, W, mesh, interpret,
    fused,
):
    """The int8-cache decode-attention kernels per tensor-parallel shard.

    Same Megatron decomposition as _pallas_attn_sharded: each device holds
    its head group's int8 value blocks [B_local, T, C/tp] AND the matching
    slice of the per-(token, head) scale tensors [B_local, T, n_head/tp] —
    heads never mix, so the scales shard cleanly along their head axis.
    With `fused` the in-kernel quantize + 4-buffer aliased write happens on
    the local blocks (the aliasing is per-shard, exactly the single-chip
    layout)."""
    from jax.sharding import PartitionSpec as P

    from rqvae_tpu.ops import attention_kernel as _AK
    from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    nh_local = n_head // n_model
    row = P(DATA_AXIS, MODEL_AXIS)
    cch = P(DATA_AXIS, None, MODEL_AXIS)  # [B, T, C] and [B, T, nh] alike
    kernel = _AK.decode_attention_q8_update if fused else _AK.decode_attention_q8

    def f(qs, ks_, vs_, kql, ksl, vql, vsl, cl):
        return kernel(
            qs, ks_, vs_, kql, ksl, vql, vsl, cl, nh_local,
            t_window=W, interpret=interpret,
        )

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(row, row, row, cch, cch, cch, cch, P()),
        out_specs=(row, cch, cch, cch, cch) if fused else row,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(q2, k2, v2, kq_l, ks_l, vq_l, vs_l, cur_len)


def _decode_attention_xla(q, k, v, k_l, v_l, cur_len, n_head, mode="auto", v_mode="vpu"):
    """S=1 attention against one layer's [B, T, C] cache (same math as
    stack_step's attention_decode).

    Two formulations, selected by `mode` (from the DecodePolicy, static):
      'vpu': per-head scores via broadcast-mul + segment reduce — wins at
        small batch (bs100: 6.18 vs 6.48 AR ms/sample, 1.4B).
      'mxu': scores as one batched MXU dot against the 0/1 head-segment
        matrix (cache read once, fp32 MAC, no lane-padded hs-minor
        reshapes) at the cost of materializing a [B, C, nh] q-segment
        operand. The VPU score path streams through the ~290 GB/s
        elementwise ceiling and scales with T*B, while qseg scales only
        with B — measured wins at bs200 (4.93 vs 5.18) and bs500
        (4.94 vs 5.12).
      'auto'/'pallas': resolved here to mxu for B >= 150, vpu below.
    v_mode='mxu' additionally routes the V-weighted sum through segment
    dots — measured SLOWER everywhere (bs500: 5.40 vs 4.94); kept for
    experiments only.
    """
    B, _, C = q.shape
    t_max = k_l.shape[1]
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    past_mask_t1 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) < cur_len
    )
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
    if v_mode == "mxu":
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
    policy: DecodePolicy = DEFAULT_POLICY,
    mesh=None,  # tensor-parallel Mesh: Pallas attention runs per-shard
):
    """Unrolled cached decode/prefill step. Semantically identical to
    `stack_step` on the stacked cache (asserted in tests); faster at decode
    because no per-layer cache slices are materialised. A static `window`
    (>= cur_len + 1 for every step it serves) bounds how much of each cache
    attention streams — the sampler phases its position scan so early
    positions read a fraction of the full cache.

    Under a tensor-parallel `mesh` (params Megatron-sharded over 'model')
    the Pallas attention kernel — an opaque custom call GSPMD cannot
    partition — is wrapped in shard_map over (data, model): each device
    runs the fused-write kernel on its own n_head/tp heads ([B_local, T,
    C/tp] cache block), which is exactly the kernel's native layout since
    heads never mix. Dense stays on XLA under a mesh (the weight-streaming
    kernels would need their own partition rule, and measured policy keeps
    one custom-call family anyway)."""
    if not layer_params:  # 0-layer stacks (VQGAN-equivalent d=1: no head)
        return x, caches
    B, S, C = x.shape
    n_head = cfg.n_head
    hs = C // n_head
    # int8 cache variant: per-layer (kq, k_scale, vq, v_scale) 4-tuples
    # (init_unrolled_kv_cache_q8) instead of (k, v) pairs
    q8_cache = len(caches[0]) == 4
    cache_T = caches[0][0].shape[1]
    t_max = cache_T
    if window is not None:
        t_max = min(window, t_max)
    scale = 1.0 / np.sqrt(hs)

    if S > 1:
        past_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_max), 3) < cur_len
        )
        chunk_mask = jnp.tril(jnp.ones((S, S), dtype=bool))

    attn_backend = resolve_attn_backend(
        policy.attn, batch=B, t_max=t_max, C=C, n_head=n_head,
        dtype=jnp.bfloat16 if q8_cache else caches[0][0].dtype,
        cache_T=cache_T, mesh=mesh, interpret=policy.interpret,
    )
    if q8_cache and attn_backend == "pallas":
        # the int8 cache block needs the int8 sublane tile (32 rows); fall
        # back to the XLA-dequant path when the allocation is not aligned
        if not ((-(-t_max // 32) * 32 <= cache_T) or cache_T % 32 == 0):
            attn_backend = "mxu" if B >= 150 else "vpu"
    # q8 cache under a TP mesh: the Pallas kernels run per shard via
    # _pallas_attn_q8_sharded (head-sliced scale tensors); the XLA-dequant
    # fallback below is mesh-agnostic (GSPMD partitions it normally)
    dense_backend = (
        resolve_dense_backend(
            policy.dense, batch=B, C=C, dtype=x.dtype,
            attn_backend=attn_backend, interpret=policy.interpret,
        )
        if S == 1 and mesh is None
        else "xla"
    )
    dense_mode = dense_backend == "pallas"
    sub = sublane_tile(caches[0][0].dtype)
    lp0 = layer_params[0]
    mega_ok = (
        dense_backend == "mega"
        and not q8_cache
        and "wqkv" in lp0["attn"]
        and (-(-t_max // sub) * sub <= cache_T or cache_T % sub == 0)
        and not any(
            isinstance(w, QuantizedWeight)
            for w in (
                lp0["attn"]["wqkv"], lp0["attn"]["wo"],
                lp0["mlp"]["w1"], lp0["mlp"]["w2"],
            )
        )
    )

    if mega_ok:
        from rqvae_tpu.ops import decode_megakernel as _MK

        W = min(cache_T, -(-t_max // sub) * sub)
        xt = x[:, 0, :]
        new_caches = []
        for lp, (k_l, v_l) in zip(layer_params, caches):
            xt, k_new, v_new = _MK.decode_layer_step(
                xt, k_l, v_l, cur_len,
                lp["ln1"]["scale"], lp["ln1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                lp["attn"]["wo"], lp["attn"]["bo"],
                lp["ln2"]["scale"], lp["ln2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"],
                lp["mlp"]["w2"], lp["mlp"]["b2"],
                n_head=n_head, t_window=W, t_chunk=sub,
                gelu_version=cfg.gelu, interpret=policy.interpret,
            )
            new_caches.append(
                (
                    jax.lax.dynamic_update_slice(
                        k_l, k_new[:, None].astype(k_l.dtype), (0, cur_len, 0)
                    ),
                    jax.lax.dynamic_update_slice(
                        v_l, v_new[:, None].astype(v_l.dtype), (0, cur_len, 0)
                    ),
                )
            )
        return xt[:, None, :], tuple(new_caches)

    new_caches = []
    for lp, cache_l in zip(layer_params, caches):
        if q8_cache:
            kq_l, ks_l, vq_l, vs_l = cache_l
            if attn_backend == "pallas" and S == 1:
                k_l = v_l = None  # the q8 kernel streams int8 directly
            else:
                # XLA fallback / prefill: materialize the bf16 cache once
                # per layer (correctness path; the kernel never does this)
                from rqvae_tpu.ops import attention_kernel as _AK

                k_l = _AK.dequantize_cache(kq_l, ks_l, n_head)
                v_l = _AK.dequantize_cache(vq_l, vs_l, n_head)
        else:
            k_l, v_l = cache_l
        # the dense kernels consume wqkv, wo, w1 AND w2: route fully-plain
        # layers through the bf16 streaming kernels and fully-int8 layers
        # through the q8 variants (int8 DMA at half the bytes, in-kernel
        # dequant into the MXU feed); a PARTIALLY quantized layer — which
        # quantize_stack_params never produces — falls back to XLA rather
        # than reaching a kernel with a QuantizedWeight pytree
        n_quant = sum(
            isinstance(w, QuantizedWeight)
            for w in (
                lp["attn"].get("wqkv"), lp["attn"]["wo"],
                lp["mlp"]["w1"], lp["mlp"]["w2"],
            )
        )
        dense_ok = dense_mode and "wqkv" in lp["attn"] and n_quant in (0, 4)
        dense_q8 = dense_ok and n_quant == 4
        k_wr = v_wr = None  # set when the attention kernel wrote the cache
        if dense_ok:
            from rqvae_tpu.ops import decode_layer_kernel as _DK

            if dense_q8:
                # ring variant (tools/exp_qkv_ring.py): the QKV stream is
                # only 3 chunks at the default size, so the 2-deep grid
                # pipeline's ramp latency costs ~5% — the 3-deep ring
                # recovers it (0.45 -> 0.43 ms on the 16-layer chain)
                qkv = _DK.fused_ln_qkv_q8_ring(
                    x[:, 0, :], lp["ln1"]["scale"], lp["ln1"]["bias"],
                    lp["attn"]["wqkv"].q, lp["attn"]["wqkv"].scale,
                    lp["attn"]["bqkv"], interpret=policy.interpret,
                )[:, None, :]
            else:
                qkv = _DK.fused_ln_qkv(
                    x[:, 0, :], lp["ln1"]["scale"], lp["ln1"]["bias"],
                    lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                    interpret=policy.interpret,
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
            if attn_backend == "pallas":
                from rqvae_tpu.ops import attention_kernel as _AK

                # round the window up to the sublane tile so Mosaic gets an
                # aligned cache block; rows in [cur_len, W) are masked out
                # (alignment of the result is part of _pallas_attn_legal)
                if q8_cache:
                    W = min(cache_T, -(-t_max // 32) * 32)
                    wo_foldable = (
                        policy.attn_wo
                        and mesh is None
                        and cache_T % 32 == 0
                        and not dense_ok
                        and S == 1
                    )
                    if wo_foldable:
                        # wo projection + residual + LN2 folded into the
                        # fused-write kernel (boundary-reduction experiment;
                        # see DecodePolicy.attn_wo)
                        wo_p = lp["attn"]["wo"]
                        if isinstance(wo_p, QuantizedWeight):
                            wo_arr, wo_sc = wo_p.q, wo_p.scale
                        else:
                            wo_arr = wo_p
                            wo_sc = jnp.ones((C,), jnp.float32)
                        x2f, h2f, kq_wr, ks_wr, vq_wr, vs_wr = (
                            _AK.decode_attention_q8_update_wo(
                                q[:, 0, :], k[:, 0, :], v[:, 0, :],
                                kq_l, ks_l, vq_l, vs_l, cur_len,
                                x[:, 0, :], wo_arr, wo_sc, lp["attn"]["bo"],
                                lp["ln2"]["scale"], lp["ln2"]["bias"],
                                n_head, t_window=W,
                                interpret=policy.interpret,
                            )
                        )
                        k_wr = (kq_wr, ks_wr, vq_wr, vs_wr)  # sentinel
                        # MLP directly from the kernel's h2; skip the
                        # default tail entirely
                        m = _mm(
                            gelu(
                                _mm(h2f, lp["mlp"]["w1"]) + lp["mlp"]["b1"],
                                cfg.gelu,
                            ),
                            lp["mlp"]["w2"],
                        ) + lp["mlp"]["b2"]
                        x = (x2f + m)[:, None, :]
                        new_caches.append(k_wr)
                        continue
                    if cache_T % 32 == 0:
                        # fused write: quantize + 4-buffer cache update
                        # inside the kernel (the XLA-side version was
                        # measured end-to-end neutral — the write cost ate
                        # the read saving)
                        if mesh is not None:
                            y, kq_wr, ks_wr, vq_wr, vs_wr = (
                                _pallas_attn_q8_sharded(
                                    q[:, 0, :], k[:, 0, :], v[:, 0, :],
                                    kq_l, ks_l, vq_l, vs_l,
                                    cur_len, n_head, W, mesh,
                                    policy.interpret, fused=True,
                                )
                            )
                        else:
                            y, kq_wr, ks_wr, vq_wr, vs_wr = (
                                _AK.decode_attention_q8_update(
                                    q[:, 0, :], k[:, 0, :], v[:, 0, :],
                                    kq_l, ks_l, vq_l, vs_l,
                                    cur_len, n_head, t_window=W,
                                    interpret=policy.interpret,
                                )
                            )
                        y = y[:, None, :]
                        k_wr = (kq_wr, ks_wr, vq_wr, vs_wr)  # sentinel
                    elif mesh is not None:
                        y = _pallas_attn_q8_sharded(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :],
                            kq_l, ks_l, vq_l, vs_l,
                            cur_len, n_head, W, mesh,
                            policy.interpret, fused=False,
                        )[:, None, :]
                    else:
                        y = _AK.decode_attention_q8(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :],
                            kq_l, ks_l, vq_l, vs_l,
                            cur_len, n_head, t_window=W,
                            interpret=policy.interpret,
                        )[:, None, :]
                elif cache_T % sublane_tile(k_l.dtype) == 0:
                    # fused in-kernel cache write (input_output_aliases):
                    # kills the XLA dynamic-update-slice whose tile
                    # read-modify-write cost ~96us/cache at bs500 (~20% of
                    # AR — the bs500 trace decomposition in COVERAGE.md)
                    sub = sublane_tile(k_l.dtype)
                    W = min(k_l.shape[1], -(-t_max // sub) * sub)
                    if mesh is not None:
                        y, k_wr, v_wr = _pallas_attn_sharded(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :], k_l, v_l,
                            cur_len, n_head, W, mesh, policy.interpret,
                            fused=True,
                        )
                    else:
                        y, k_wr, v_wr = _AK.decode_attention_update(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :], k_l, v_l,
                            cur_len, n_head, t_window=W,
                            interpret=policy.interpret,
                        )
                    y = y[:, None, :]
                else:
                    sub = sublane_tile(k_l.dtype)
                    W = min(k_l.shape[1], -(-t_max // sub) * sub)
                    if mesh is not None:
                        y = _pallas_attn_sharded(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :], k_l, v_l,
                            cur_len, n_head, W, mesh, policy.interpret,
                            fused=False,
                        )[:, None, :]
                    else:
                        y = _AK.decode_attention(
                            q[:, 0, :], k[:, 0, :], v[:, 0, :], k_l, v_l,
                            cur_len, n_head, t_window=W,
                            interpret=policy.interpret,
                        )[:, None, :]
            else:
                y = _decode_attention_xla(
                    q, k, v, k_l[:, :t_max], v_l[:, :t_max], cur_len, n_head,
                    mode=attn_backend, v_mode=policy.attn_v,
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
        if dense_ok and dense_q8:
            # ring variant: explicit 3-deep DMA pipeline recovers the ~13%
            # the 2-deep grid pipeline leaves on int8's half-size chunks
            # (isolated-chain win; tools/exp_q8_pipeline.py)
            x = _DK.fused_proj_mlp_q8_ring(
                x[:, 0, :], y[:, 0, :],
                lp["attn"]["wo"].q, lp["attn"]["wo"].scale, lp["attn"]["bo"],
                lp["ln2"]["scale"], lp["ln2"]["bias"],
                lp["mlp"]["w1"].q, lp["mlp"]["w1"].scale, lp["mlp"]["b1"],
                lp["mlp"]["w2"].q, lp["mlp"]["w2"].scale, lp["mlp"]["b2"],
                gelu_version=cfg.gelu, interpret=policy.interpret,
            )[:, None, :]
        elif dense_ok:
            x = _DK.fused_proj_mlp(
                x[:, 0, :], y[:, 0, :],
                lp["attn"]["wo"], lp["attn"]["bo"],
                lp["ln2"]["scale"], lp["ln2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"],
                lp["mlp"]["w2"], lp["mlp"]["b2"],
                gelu_version=cfg.gelu, interpret=policy.interpret,
            )[:, None, :]
        else:
            x2 = x + (_mm(y, lp["attn"]["wo"]) + lp["attn"]["bo"])
            h2 = layer_norm(x2, lp["ln2"]["scale"], lp["ln2"]["bias"])
            m = _mm(gelu(_mm(h2, lp["mlp"]["w1"]) + lp["mlp"]["b1"], cfg.gelu), lp["mlp"]["w2"]) + lp["mlp"]["b2"]
            x = x2 + m
        if q8_cache and k_wr is not None:
            # the q8 kernel already quantized and wrote all four caches
            new_caches.append(k_wr)
        elif q8_cache:
            from rqvae_tpu.ops import attention_kernel as _AK

            kqn, ksn = _AK.quantize_kv(k.reshape(B * S, C), n_head)
            vqn, vsn = _AK.quantize_kv(v.reshape(B * S, C), n_head)
            new_caches.append(
                (
                    jax.lax.dynamic_update_slice(
                        kq_l, kqn.reshape(B, S, C), (0, cur_len, 0)
                    ),
                    jax.lax.dynamic_update_slice(
                        ks_l,
                        ksn.reshape(B, S, n_head).astype(ks_l.dtype),
                        (0, cur_len, 0),
                    ),
                    jax.lax.dynamic_update_slice(
                        vq_l, vqn.reshape(B, S, C), (0, cur_len, 0)
                    ),
                    jax.lax.dynamic_update_slice(
                        vs_l,
                        vsn.reshape(B, S, n_head).astype(vs_l.dtype),
                        (0, cur_len, 0),
                    ),
                )
            )
        elif k_wr is not None:
            new_caches.append((k_wr, v_wr))
        else:
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
    remat: bool = False,  # rematerialize layer activations in backward
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

    h = stack_forward(
        params["body"], latents, config.body, rngs[1], deterministic, remat=remat
    )
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
        params["head"], depth_full, config.head, rngs[2], deterministic, remat=remat
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
