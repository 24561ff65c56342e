"""Autoregressive sampling for the RQ-Transformer as a single jitted scan.

The reference samples with a Python loop over product(H, W, D) — 256
sequential `cached_forward` kernel launches per image
(/root/reference/rqvae/models/rqtransformer/transformers.py:294-369). Here
the whole loop is ONE compiled program: a `lax.scan` over the H*W spatial
positions whose carry holds the body KV cache and running spatial context,
with the D-deep residual loop unrolled inside each step (D is small and
static). The depth head re-runs causal attention over its <=D rows each step
instead of keeping a cache — at D<=4 rows that is cheaper than cache
bookkeeping and keeps every shape static.

Sampling semantics replicate reference sample_from_logits
(/root/reference/rqvae/utils/utils.py:60-123) exactly: fp32 cast,
temperature, top-k on logits (keeping ties with the k-th value), NaN guard,
softmax, top-p on probabilities (sorted-cumsum mask shifted right), then a
categorical draw.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import quantize as rq


# ---------------------------------------------------------------------------
# top-k / top-p / categorical (reference utils.py:60-123 semantics)
# ---------------------------------------------------------------------------


def top_k_logits(logits: jax.Array, k: int) -> jax.Array:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.float32(jnp.inf), logits)


def top_p_probs(probs: jax.Array, p: float) -> jax.Array:
    idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    remove_sorted = cum >= p
    # keep the first token that crosses p (shift right, reference utils.py:73-74)
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1
    )
    remove = jnp.put_along_axis(
        jnp.zeros_like(remove_sorted), idx, remove_sorted, axis=-1, inplace=False
    )
    probs = jnp.where(remove, 0.0, probs)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def sample_from_logits(
    rng: jax.Array,
    logits: jax.Array,  # [B, V]
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        logits = top_k_logits(logits, top_k)
    logits = jnp.where(jnp.isnan(logits), -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    if top_p is not None:
        probs = top_p_probs(probs, top_p)
    log_probs = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    return jax.random.categorical(rng, log_probs, axis=-1).astype(jnp.int32)


def sample_from_logits_fast(
    rng: jax.Array,
    logits: jax.Array,  # [B, V]
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Distribution-identical fast path: do the top-p filter inside the
    already-sorted top-k candidate set (lax.top_k returns descending order),
    draw in k-space, and map back through the indices — no full-vocab
    argsort, no scatter. With top-k active only k candidates can survive the
    reference's top-p mask, so the kept set matches `sample_from_logits`
    except for exact fp ties at the k-th logit (reference keeps ties, this
    keeps exactly k)."""
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32) / temperature
    logits = jnp.where(jnp.isnan(logits), -jnp.inf, logits)

    if top_k is None and top_p is None:
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
    if top_p is None:
        if top_k >= V:
            return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
        vals, idx = jax.lax.top_k(logits, top_k)
        j = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, j[..., None], axis=-1)[..., 0].astype(jnp.int32)

    k = top_k if (top_k is not None and top_k < V) else V
    vals, idx = jax.lax.top_k(logits, k)  # sorted descending
    probs = jax.nn.softmax(vals, axis=-1)  # == softmax over kept set
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum >= top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    filtered = jnp.where(remove, -jnp.inf, vals)
    j = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.take_along_axis(idx, j[..., None], axis=-1)[..., 0].astype(jnp.int32)


def broadcast_topk_topp(config: TransformerConfig, top_k, top_p):
    """Per-depth top-k/top-p lists from scalar/len-1/len-D inputs
    (reference transformers.py:314-330)."""
    D = config.depth
    if top_k is None:
        top_k_list = [config.vocab_size[i] for i in range(D)]
    elif isinstance(top_k, int):
        top_k_list = [min(top_k, config.vocab_size[i]) for i in range(D)]
    elif len(top_k) == 1:
        top_k_list = [min(top_k[0], config.vocab_size[i]) for i in range(D)]
    else:
        top_k_list = [min(top_k[i], config.vocab_size[i]) for i in range(D)]

    if top_p is None:
        top_p_list = [None] * D
    elif isinstance(top_p, float):
        top_p_list = [min(top_p, 1.0)] * D
    elif len(top_p) == 1:
        top_p_list = [min(top_p[0], 1.0)] * D
    else:
        top_p_list = [min(top_p[i], 1.0) for i in range(D)]
    return top_k_list, top_p_list


# ---------------------------------------------------------------------------
# the sampling scan
# ---------------------------------------------------------------------------


def _vq_lookup(vq_state: rq.CodebookState, vq_config: rq.QuantizerConfig, d: int, code):
    cb = vq_state.embed[vq_config.codebook_index(d)][: vq_config.n_embed[d]]
    return rq.embed_lookup(cb, code)


def _tp_mesh_of(params):
    """The mesh of the first param leaf sharded over the tensor-parallel
    'model' axis, or None when params are unsharded/replicated/DP-only."""
    from rqvae_tpu.parallel.mesh import MODEL_AXIS

    for leaf in jax.tree.leaves(params):
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec is None:
            continue
        for part in spec:
            axes = part if isinstance(part, tuple) else (part,)
            if MODEL_AXIS in axes:
                return sharding.mesh
    return None


def _tp_safe_policy(policy: M.DecodePolicy) -> M.DecodePolicy:
    """Restrict the decode policy to what tensor-parallel sampling supports.

    The Pallas ATTENTION kernel runs per-shard under shard_map
    (model._pallas_attn_sharded) — 'auto'/'pallas' stay, and
    resolve_attn_backend (which receives the mesh at every decode call
    site) applies legality and the vpu/mxu crossovers to the PER-DEVICE
    geometry (C and heads / model axis, batch / data axis).
    The q8 fused-write kernel runs per-shard too (_pallas_attn_q8_sharded):
    the [B, T, n_head] scale tensors shard along their head axis with the
    Megatron head groups, so kv_q8 passes through unchanged. (Where the
    kernel is per-shard illegal the XLA fallback dequantizes the cache each
    step — correct but slower than bf16; same policy note as single-chip.)
    The DENSE kernels and the megakernel stay opaque custom calls with no
    partition rule (their weight operands are the sharded tensors), so
    dense is pinned to XLA."""
    dense = policy.dense if policy.dense not in ("auto", "pallas", "mega") else "xla"
    return policy._replace(dense=dense)


def sample(
    params: dict,
    config: TransformerConfig,
    rng: jax.Array,
    batch_size: int,
    cond: Optional[jax.Array] = None,  # [B] / [B, Lc] ints or None
    vq_state: Optional[rq.CodebookState] = None,
    vq_config: Optional[rq.QuantizerConfig] = None,
    temperature: float = 1.0,
    top_k=None,  # int or tuple per depth (static)
    top_p=None,  # float or tuple per depth (static)
    dtype=jnp.float32,
    policy: Optional[M.DecodePolicy] = None,
) -> jax.Array:
    """Sample codes [B, H, W, D] (reference RQTransformer.sample
    transformers.py:294-369, cached path).

    Plain-Python wrapper: resolves the decode DecodePolicy from the
    environment HERE (the only env read on the decode path — flipping a
    RQVAE_TPU_* knob between calls takes effect predictably because the
    policy is a static jit key of `_sample`), then dispatches to the jitted
    implementation."""
    if policy is None:
        policy = M.decode_policy_from_env()
    H, W, _ = config.block_size
    if policy.unroll is None:
        policy = policy._replace(unroll=H * W <= 128)
    if policy.kv_q8 and not policy.unroll:
        warnings.warn(
            "kv_q8 requires the unrolled decode path (per-layer caches); "
            "ignoring RQVAE_TPU_KV_Q8 for the stacked-cache scan"
        )
        policy = policy._replace(kv_q8=False)
    tp_mesh = _tp_mesh_of(params)
    if tp_mesh is not None:
        # tensor-parallel serving: params Megatron-sharded over 'model'
        # (parallel/mesh.py::transformer_param_specs) — GSPMD partitions the
        # whole AR scan (head-sharded KV caches, psum after proj/mlp-out,
        # all-gather of the vocab-split logits before the draw); the Pallas
        # attention kernel runs per-shard via shard_map, everything else
        # stays XLA (see _tp_safe_policy).
        policy = _tp_safe_policy(policy)
    return _sample(
        params, config, rng, batch_size, cond, vq_state, vq_config,
        temperature,
        tuple(top_k) if isinstance(top_k, (list, tuple)) else top_k,
        tuple(top_p) if isinstance(top_p, (list, tuple)) else top_p,
        dtype, policy, tp_mesh,
    )


@partial(
    jax.jit,
    static_argnames=(
        "config",
        "vq_config",
        "batch_size",
        "temperature",
        "top_k",
        "top_p",
        "dtype",
        "policy",
        "mesh",
    ),
)
def _sample(
    params: dict,
    config: TransformerConfig,
    rng: jax.Array,
    batch_size: int,
    cond: Optional[jax.Array] = None,
    vq_state: Optional[rq.CodebookState] = None,
    vq_config: Optional[rq.QuantizerConfig] = None,
    temperature: float = 1.0,
    top_k=None,
    top_p=None,
    dtype=jnp.float32,
    policy: M.DecodePolicy = M.DEFAULT_POLICY,
    mesh=None,  # tensor-parallel Mesh (static): Pallas attn via shard_map
) -> jax.Array:
    H, W, D = config.block_size
    HW = H * W
    C = config.embed_dim
    B = batch_size
    cond_len = config.block_size_cond

    top_k_list, top_p_list = broadcast_topk_topp(
        config,
        tuple(top_k) if isinstance(top_k, (list, tuple)) else top_k,
        tuple(top_p) if isinstance(top_p, (list, tuple)) else top_p,
    )

    if config.input_emb_vqvae or config.head_emb_vqvae:
        assert vq_state is not None and vq_config is not None

    def body_emb_of_code(d, code):
        """input-side embedding of one sampled code at depth d -> [B, C]."""
        if config.input_emb_vqvae:
            e = _vq_lookup(vq_state, vq_config, d, code)
            return (
                e @ params["input_mlp"]["kernel"] + params["input_mlp"]["bias"]
            ).astype(dtype)
        off = int(M.tok_emb_offsets(config)[d]) if not config.shared_tok_emb else 0
        return jnp.take(params["tok_emb"], code + off, axis=0).astype(dtype)

    def head_row_of_prefix(d, raw_cum, code):
        """head-context row for depth d+1 given codes up to depth d."""
        if config.head_emb_vqvae:
            e = _vq_lookup(vq_state, vq_config, d, code)
            raw_cum = raw_cum + e if config.cumsum_depth_ctx else e
            row = raw_cum @ params["head_mlp"]["kernel"] + params["head_mlp"]["bias"]
            return raw_cum, row.astype(dtype)
        off = int(M.tok_emb_offsets(config)[d]) if not config.shared_tok_emb else 0
        return raw_cum, jnp.take(params["tok_emb"], code + off, axis=0).astype(dtype)

    # ---- prefill: cond tokens through the body -------------------------
    if cond is None:
        cond = jnp.zeros((B, cond_len), jnp.int32)
    else:
        cond = cond.reshape(B, cond_len)
    conds_emb = (
        jnp.take(params["cond_emb"], cond, axis=0)
        + params["pos_emb_cond"][:, :cond_len]
    ).astype(dtype)

    # UNROLLED layer decode (separate per-layer caches): removes the
    # per-layer cache-slice copy of the stacked-cache scan — measured
    # 5.76 -> 5.19 ms/sample on the 1.4B body at bs100 (model.py notes).
    # At LONG spatial sequences the unrolled form backfires (f16-d1:
    # 255 steps x 48 layers measured 129 vs 65 ms/sample stacked — XLA
    # stops aliasing the many separate cache buffers in place), so the
    # default policy falls back to the stacked-cache scan beyond 128
    # positions (resolved in `sample`).
    use_unrolled = policy.unroll if policy.unroll is not None else HW <= 128

    if use_unrolled:
        t_max = cond_len + HW - 1  # the last position's k/v are never read
        # allocate the cache rounded up to the Mosaic sublane tile: the
        # Pallas decode-attention kernel's window must be tile-aligned, and
        # rows >= cur_len are masked anyway so the padding is free (fixes
        # the unaligned-cache compile failure for conditional geometries
        # whose cond_len + HW - 1 is not a tile multiple)
        sub_c = 32 if policy.kv_q8 else M.sublane_tile(dtype)
        t_alloc = -(-t_max // sub_c) * sub_c
        body_lps = M.split_layer_params(params["body"], config.body)
        head_lps = M.split_layer_params(params["head"], config.head)
        if policy.kv_q8:
            # int8 BODY cache (opt-in): halves the dominant cache HBM
            # stream; the head's D-slot caches stay bf16 (no bytes to win)
            body_caches = M.init_unrolled_kv_cache_q8(config.body, B, t_alloc)
        else:
            body_caches = M.init_unrolled_kv_cache(config.body, B, t_alloc, dtype)
        if mesh is not None:
            # pin the TP cache layout to the shard_map specs of the Pallas
            # attention ([B@data, T, C@model]) so GSPMD never inserts a
            # reshard at the kernel boundary; this is also what
            # propagation picks for the XLA fallback (k/v come out of
            # column-parallel projections)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            cache_sh = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))
            body_caches = jax.tree.map(
                lambda c: jax.lax.with_sharding_constraint(c, cache_sh),
                body_caches,
            )

        def body_step(x, caches, cur_len, window=None):
            return M.stack_step_unrolled(
                body_lps, x, caches, cur_len, config.body, window=window,
                policy=policy, mesh=mesh,
            )

        def head_step(row, caches, cur_len):
            return M.stack_step_unrolled(
                head_lps, row, caches, cur_len, config.head, policy=policy,
                mesh=mesh,
            )

        def init_head_caches():
            return M.init_unrolled_kv_cache(config.head, B, D, dtype)
    else:
        # r1 structure preserved EXACTLY (one spare cache slot, one scan
        # over all HW steps, no window arg): restructuring the stacked path
        # like the unrolled one (HW-1 steps + final depth-only sample)
        # measured 63 -> 155 ms/sample AR on f16-d1 — XLA's scan pipelining
        # of the stacked cache is brittle to the shape change.
        t_max = cond_len + HW
        body_caches = M.init_kv_cache(config.body, B, t_max, dtype)

        def body_step(x, caches, cur_len, window=None):
            return M.stack_step(
                params["body"], x, caches, cur_len, config.body, window=window,
                attn_mode=policy.attn, mesh=mesh,
            )

        def head_step(row, caches, cur_len):
            return M.stack_step(
                params["head"], row, caches, cur_len, config.head,
                attn_mode=policy.attn, mesh=mesh,
            )

        def init_head_caches():
            return M.init_kv_cache(config.head, B, D, dtype)

    h, body_caches = body_step(conds_emb, body_caches, jnp.int32(0))
    spatial_ctx = h[:, -1, :]  # [B, C]

    pos_hw = params["pos_emb_hw"][0].astype(dtype)  # [HW, C]
    pos_d = params["pos_emb_d"][0].astype(dtype)  # [D, C]
    raw_dim = (
        vq_config.embed_dim if (config.head_emb_vqvae and vq_config is not None) else 1
    )

    # policy.exact_sample selects the reference-exact top-k tie semantics
    # (keeps ALL logits tied with the k-th value, utils.py:60-64) over the
    # distribution-identical fast path (keeps exactly k)
    draw_fn = sample_from_logits if policy.exact_sample else sample_from_logits_fast

    def depth_sample(rng, spatial_ctx):
        """Sample the D residual codes for one spatial position through the
        incremental depth head (tiny per-layer D-slot caches)."""
        raw_cum = jnp.zeros((B, raw_dim), jnp.float32)
        body_sum = jnp.zeros((B, C), dtype)
        codes_t = []
        head_caches = init_head_caches()
        row = (spatial_ctx + pos_d[0])[:, None, :]
        for d in range(D):
            h, head_caches = head_step(row, head_caches, jnp.int32(d))
            logits = M.classifier_apply(params, config, h[:, 0, :], depth_idx=d)
            rng, sub = jax.random.split(rng)
            code_d = draw_fn(
                sub, logits, temperature, top_k_list[d], top_p_list[d]
            )
            codes_t.append(code_d)
            body_sum = body_sum + body_emb_of_code(d, code_d)
            if d < D - 1:
                raw_cum, r = head_row_of_prefix(d, raw_cum, code_d)
                row = (r + pos_d[d + 1])[:, None, :]
        return rng, jnp.stack(codes_t, axis=-1), body_sum

    def make_step(window):
        def step(carry, inputs):
            rng, spatial_ctx, caches = carry
            t, pos_row = inputs
            rng, codes_t, body_sum = depth_sample(rng, spatial_ctx)
            u = (body_sum + pos_row)[:, None, :]  # [B, 1, C]
            h, caches = body_step(u, caches, cond_len + t, window=window)
            return (rng, h[:, 0, :], caches), codes_t

        return step

    # Phased position scan: early phases stream only a STATIC PREFIX of each
    # per-layer cache (cache reads + score work scale with the window), later
    # phases the full window. With the UNROLLED per-layer caches the static
    # prefix slice fuses into the attention reads (no copy) — measured
    # 5.26 -> 4.60 ms/sample body-only at 2 phases, bs100 1.4B (the round-1
    # note about bucketing being slower applied to the STACKED-cache scan,
    # whose windows still paid the per-layer dynamic-slice copy).
    #
    # The final position only needs its depth codes — the reference advances
    # the body cache there too and throws the result away
    # (transformers.py:345-365); the scans stop one step early and the last
    # depth_sample runs outside (saves 1/64 of body decode compute).
    if not use_unrolled:
        # r1 single full scan (see note above): all HW steps advance the body
        (_, _, _), codes = jax.lax.scan(
            make_step(None),
            (rng, spatial_ctx, body_caches),
            (jnp.arange(HW, dtype=jnp.int32), pos_hw),
        )
        return codes.transpose(1, 0, 2).reshape(B, H, W, D)

    n_steps = HW - 1
    # default 2 phases: measured AR ms/sample on the full 1.4B sampler at
    # bs100: 1 phase 6.48, 2 phases 6.27, 3 phases 7.11 (more scan
    # boundaries hurt pipelining more than the window saves); isolated
    # body-only scans show a larger 2-phase win (5.26 -> 4.60) — the
    # interleaved depth head dilutes it.
    n_phases = min(max(1, policy.phases), max(1, n_steps // 8))
    bounds = [round(n_steps * i / n_phases) for i in range(n_phases + 1)]
    if use_unrolled and M.resolve_attn_backend(
        policy.attn, batch=B, t_max=t_max, C=C, n_head=config.body.n_head,
        dtype=dtype, cache_T=t_alloc, mesh=mesh, interpret=policy.interpret,
    ) == "pallas":
        # the Pallas decode-attention kernel rounds its cache window up to
        # the sublane tile; snap interior phase bounds down so each phase's
        # window (cond_len + e) is already aligned and nothing is over-read
        sub = M.sublane_tile(dtype)
        for i in range(1, n_phases):
            e_al = ((cond_len + bounds[i]) // sub) * sub - cond_len
            if e_al > bounds[i - 1]:
                bounds[i] = e_al
    carry = (rng, spatial_ctx, body_caches)
    chunks = []
    for p in range(n_phases):
        s, e = bounds[p], bounds[p + 1]
        if e <= s:
            continue
        window = min(t_max, cond_len + e)
        carry, codes_p = jax.lax.scan(
            make_step(window),
            carry,
            (jnp.arange(s, e, dtype=jnp.int32), pos_hw[s:e]),
        )
        chunks.append(codes_p)
    rng, last_ctx, _ = carry
    _, codes_last, _ = depth_sample(rng, last_ctx)
    codes = jnp.concatenate(chunks + [codes_last[None]], axis=0)
    # codes: [HW, B, D] -> [B, H, W, D]
    return codes.transpose(1, 0, 2).reshape(B, H, W, D)


def forced_logits(params, config: TransformerConfig, forced, cond, vq_state, vq_config):
    """Per-location decode logits with the codes FORCED to a given sequence —
    the sampler's cache/step machinery with the categorical draw removed.

    Golden-parity harness for the reference `cached_forward` loop
    (/root/reference/rqvae/models/rqtransformer/transformers.py:190-287):
    `cli/parity_check.py --stage2` and
    tests/test_rqtransformer_parity.py compare these logits at every
    (h, w, d) against the executed reference. Returns [B, H, W, D, Vmax]."""
    import numpy as np

    B = forced.shape[0]
    H, W, D = config.block_size
    HW = H * W
    C = config.embed_dim
    cond_len = config.block_size_cond

    if cond is None:
        cond = jnp.zeros((B, cond_len), jnp.int32)
    conds_emb = (
        jnp.take(params["cond_emb"], jnp.asarray(cond).reshape(B, cond_len), axis=0)
        + params["pos_emb_cond"][:, :cond_len]
    )
    body_kv = M.init_kv_cache(config.body, B, cond_len + HW)
    h, body_kv = M.stack_step(params["body"], conds_emb, body_kv, jnp.int32(0), config.body)
    spatial_ctx = h[:, -1, :]

    pos_d = params["pos_emb_d"][0]
    offsets = M.tok_emb_offsets(config)
    out = np.zeros((B, H, W, D, config.vocab_size_max), np.float32)
    forced_flat = np.asarray(forced).reshape(B, HW, D)

    for t in range(HW):
        depth_in = jnp.zeros((B, D, C))
        depth_in = depth_in.at[:, 0, :].set(spatial_ctx + pos_d[0])
        raw_cum = 0.0
        body_sum = jnp.zeros((B, C))
        for d in range(D):
            hh = M.stack_forward(params["head"], depth_in, config.head)
            logits = M.classifier_apply(params, config, hh[:, d, :], depth_idx=d)
            out[:, t // W, t % W, d] = np.asarray(logits)
            code_d = jnp.asarray(forced_flat[:, t, d])
            if config.input_emb_vqvae:
                e = rq.embed_lookup(
                    vq_state.embed[vq_config.codebook_index(d)], code_d
                )
                body_sum = body_sum + (
                    e @ params["input_mlp"]["kernel"] + params["input_mlp"]["bias"]
                )
            else:
                body_sum = body_sum + jnp.take(
                    params["tok_emb"],
                    code_d + int(offsets[d]) * (0 if config.shared_tok_emb else 1),
                    axis=0,
                )
            if d < D - 1:
                if config.head_emb_vqvae:
                    e = rq.embed_lookup(
                        vq_state.embed[vq_config.codebook_index(d)], code_d
                    )
                    raw_cum = raw_cum + e if config.cumsum_depth_ctx else e
                    row = raw_cum @ params["head_mlp"]["kernel"] + params["head_mlp"]["bias"]
                else:
                    row = jnp.take(
                        params["tok_emb"],
                        code_d + int(offsets[d]) * (0 if config.shared_tok_emb else 1),
                        axis=0,
                    )
                depth_in = depth_in.at[:, d + 1, :].set(row + pos_d[d + 1])
        u = (body_sum + params["pos_emb_hw"][0, t])[:, None, :]
        h, body_kv = M.stack_step(
            params["body"], u, body_kv, jnp.int32(cond_len + t), config.body
        )
        spatial_ctx = h[:, 0, :]
    return out
