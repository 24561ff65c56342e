"""Residual-quantization core ops, TPU-native.

Functional re-design of the reference VQEmbedding / RQBottleneck
(/root/reference/rqvae/models/rqvae/quantizations.py:24-400). All state
(codebooks + EMA statistics) lives in explicit pytrees threaded through pure
functions so the whole thing jits/pjits; cross-device reduction of EMA batch
statistics is a `psum` over the data axis (replacing dist.all_reduce at
quantizations.py:100-102) and the unused-code restart uses a shared PRNG key
on all shards (replacing the rank-0 broadcast at :113-114).

Codebook layout: `codebooks[d]` is a [n_embed, embed_dim] fp32 array per
depth; shared-codebook mode stores a single physical array used at every
depth. The reference's `n_embed + 1` padding row (zero embedding) is modeled
implicitly: index == n_embed looks up a zero vector.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.struct

from rqvae_tpu.ops.rq_kernel import nearest_code as _nearest_code_kernel


@flax.struct.dataclass
class CodebookState:
    """Codebook weights + EMA statistics for one RQ bottleneck.

    embed:        [n_codebooks, n_embed, embed_dim] codebook vectors
    cluster_size: [n_codebooks, n_embed]   EMA of per-code assignment counts
    embed_ema:    [n_codebooks, n_embed, embed_dim] EMA of assigned-vector sums

    For shared codebooks n_codebooks == 1 regardless of depth.
    """

    embed: jax.Array
    cluster_size: jax.Array
    embed_ema: jax.Array


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    latent_shape: tuple  # (H, W, D_latent)
    code_shape: tuple  # (h, w, depth)
    n_embed: tuple  # per-depth codebook sizes
    decay: tuple  # per-depth EMA decay
    shared_codebook: bool = False
    restart_unused_codes: bool = True
    ema: bool = True
    eps: float = 1e-5

    @property
    def depth(self) -> int:
        return self.code_shape[2]

    @property
    def embed_dim(self) -> int:
        # RQ does not divide feature dims (reference quantizations.py:181)
        h_ratio = self.latent_shape[0] // self.code_shape[0]
        w_ratio = self.latent_shape[1] // self.code_shape[1]
        return h_ratio * w_ratio * self.latent_shape[2]

    @property
    def n_codebooks(self) -> int:
        return 1 if self.shared_codebook else self.depth

    def codebook_index(self, d: int) -> int:
        return 0 if self.shared_codebook else d

    @staticmethod
    def create(latent_shape, code_shape, n_embed, decay=0.99, **kw) -> "QuantizerConfig":
        if not (len(code_shape) == len(latent_shape) == 3):
            raise ValueError("incompatible code shape or latent shape")
        if any(y % x != 0 for x, y in zip(code_shape[:2], latent_shape[:2])):
            raise ValueError("incompatible code shape or latent shape")
        depth = code_shape[2]
        if not isinstance(n_embed, (list, tuple)):
            n_embed = [n_embed] * depth
        if not isinstance(decay, (list, tuple)):
            decay = [decay] * depth
        assert len(n_embed) == depth and len(decay) == depth
        if kw.get("shared_codebook"):
            assert len(set(n_embed)) == 1 and len(set(decay)) == 1
        return QuantizerConfig(
            latent_shape=tuple(latent_shape),
            code_shape=tuple(code_shape),
            n_embed=tuple(n_embed),
            decay=tuple(decay),
            **kw,
        )


def init_codebook_state(key: jax.Array, config: QuantizerConfig) -> CodebookState:
    """Normal(0,1) init like torch nn.Embedding default
    (reference quantizations.py:28)."""
    n_books = config.n_codebooks
    n_embed = max(config.n_embed)
    dim = config.embed_dim
    embed = jax.random.normal(key, (n_books, n_embed, dim), dtype=jnp.float32)
    return CodebookState(
        embed=embed,
        cluster_size=jnp.zeros((n_books, n_embed), dtype=jnp.float32),
        embed_ema=embed.copy(),
    )


# ---------------------------------------------------------------------------
# distance / lookup primitives
# ---------------------------------------------------------------------------


def compute_distances(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Squared L2 distances ||x||^2 + ||c||^2 - 2 x.c, fp32 accumulation.

    x: [..., dim]; codebook: [n_embed, dim] -> [..., n_embed].
    Matches reference compute_distances (quantizations.py:43-62).
    """
    x32 = x.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    x_sq = jnp.sum(jnp.square(x32), axis=-1, keepdims=True)
    cb_sq = jnp.sum(jnp.square(cb32), axis=-1)
    dots = jax.lax.dot_general(
        x32,
        cb32,
        dimension_numbers=(((x32.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # full fp32 on MXU: code parity
        preferred_element_type=jnp.float32,
    )
    return x_sq + cb_sq - 2.0 * dots


def find_nearest(x: jax.Array, codebook: jax.Array, use_kernel: bool = True) -> jax.Array:
    """argmin_e ||x - codebook[e]||^2 -> int32 codes of shape x.shape[:-1].

    Uses the fused Pallas distance+argmin kernel on TPU (avoids materializing
    the [N, n_embed] distance matrix in HBM), XLA fallback elsewhere.
    """
    if use_kernel:
        return _nearest_code_kernel(x, codebook)
    return jnp.argmin(compute_distances(x, codebook), axis=-1).astype(jnp.int32)


def embed_lookup(codebook: jax.Array, idxs: jax.Array) -> jax.Array:
    """Codebook lookup with the implicit zero padding row at index n_embed
    (reference uses nn.Embedding(n_embed + 1, padding_idx=n_embed))."""
    n_embed = codebook.shape[0]
    safe = jnp.clip(idxs, 0, n_embed - 1)
    out = jnp.take(codebook, safe, axis=0)
    return jnp.where((idxs == n_embed)[..., None], 0.0, out)


# ---------------------------------------------------------------------------
# space-to-depth reshapes (reference to_code_shape/to_latent_shape :216-235)
# ---------------------------------------------------------------------------


def to_code_shape(x: jax.Array, config: QuantizerConfig) -> jax.Array:
    B, H, W, D = x.shape
    rH = config.latent_shape[0] // config.code_shape[0]
    rW = config.latent_shape[1] // config.code_shape[1]
    x = x.reshape(B, H // rH, rH, W // rW, rW, D)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // rH, W // rW, rH * rW * D)


def to_latent_shape(x: jax.Array, config: QuantizerConfig) -> jax.Array:
    B, h, w, _ = x.shape
    D = config.latent_shape[2]
    rH = config.latent_shape[0] // config.code_shape[0]
    rW = config.latent_shape[1] // config.code_shape[1]
    x = x.reshape(B, h, w, rH, rW, D)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * rH, w * rW, D)


# ---------------------------------------------------------------------------
# EMA codebook update (one step for one codebook)
# ---------------------------------------------------------------------------


def _ema_update_one(
    embed: jax.Array,
    cluster_size: jax.Array,
    embed_ema: jax.Array,
    vectors: jax.Array,  # [N, dim]
    idxs: jax.Array,  # [N]
    decay: float,
    eps: float,
    restart_unused_codes: bool,
    rng: Optional[jax.Array],
    axis_name: Optional[str],
):
    """EMA + restart + embedding write, mirroring reference
    _update_buffers/_update_embedding (quantizations.py:81-129).

    Cluster stats are psum-reduced over `axis_name` when inside shard_map/pjit
    per-device code (the TPU-native replacement for dist.all_reduce).
    """
    n_embed, dim = embed.shape
    vectors = vectors.reshape(-1, dim).astype(jnp.float32)
    idxs = idxs.reshape(-1)

    one_hot = jax.nn.one_hot(idxs, n_embed, dtype=jnp.float32)  # [N, n_embed]
    batch_cluster = jnp.sum(one_hot, axis=0)  # [n_embed]
    batch_sum = jax.lax.dot_general(
        one_hot,
        vectors,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [n_embed, dim]

    if axis_name is not None:
        batch_cluster = jax.lax.psum(batch_cluster, axis_name)
        batch_sum = jax.lax.psum(batch_sum, axis_name)

    cluster_size = cluster_size * decay + batch_cluster * (1.0 - decay)
    embed_ema = embed_ema * decay + batch_sum * (1.0 - decay)

    if restart_unused_codes:
        assert rng is not None, "restart_unused_codes requires a PRNG key"
        n_vectors = vectors.shape[0]
        if n_vectors < n_embed:
            # tile with small noise (reference _tile_with_noise :72-78)
            n_repeats = (n_embed + n_vectors - 1) // n_vectors
            std = 0.01 / jnp.sqrt(jnp.float32(dim))
            tiled = jnp.tile(vectors, (n_repeats, 1))
            rng, sub = jax.random.split(rng)
            tiled = tiled + jax.random.uniform(sub, tiled.shape) * std
            vectors_pool = tiled
        else:
            vectors_pool = vectors
        perm = jax.random.permutation(rng, vectors_pool.shape[0])
        random_vectors = vectors_pool[perm[:n_embed]]
        # broadcast-from-rank-0 semantics (reference dist.broadcast,
        # quantizations.py:113-114): every shard adopts shard 0's candidate
        # vectors so restarted codes are REAL latents, not cross-shard means
        if axis_name is not None:
            random_vectors = jax.lax.all_gather(random_vectors, axis_name)[0]

        usage = (cluster_size >= 1.0).astype(jnp.float32)[:, None]  # [n_embed,1]
        embed_ema = embed_ema * usage + random_vectors * (1.0 - usage)
        cluster_size = cluster_size * usage[:, 0] + (1.0 - usage[:, 0])

    n = jnp.sum(cluster_size)
    normalized = n * (cluster_size + eps) / (n + n_embed * eps)
    new_embed = embed_ema / normalized[:, None]
    return new_embed, cluster_size, embed_ema


# ---------------------------------------------------------------------------
# residual quantization
# ---------------------------------------------------------------------------


def quantize(
    x: jax.Array,
    state: CodebookState,
    config: QuantizerConfig,
    *,
    use_kernel: bool = True,
):
    """Inference-path residual quantization (no EMA update).

    x: [B, h, w, embed_dim] (already in code shape).
    Returns (quants_cumsum [depth, B, h, w, dim], codes [B, h, w, depth]).
    Mirrors reference RQBottleneck.quantize (quantizations.py:237-271).
    """
    residual = x.astype(jnp.float32)
    aggregated = jnp.zeros_like(residual)
    quant_list = []
    code_list = []
    for d in range(config.depth):
        cb = state.embed[config.codebook_index(d)][: config.n_embed[d]]
        code = find_nearest(residual, cb, use_kernel=use_kernel)
        quant = embed_lookup(cb, code)
        residual = residual - quant
        aggregated = aggregated + quant
        quant_list.append(aggregated)
        code_list.append(code)
    return jnp.stack(quant_list), jnp.stack(code_list, axis=-1)


def quantize_train(
    x: jax.Array,
    state: CodebookState,
    config: QuantizerConfig,
    rng: Optional[jax.Array],
    axis_name: Optional[str] = None,
    *,
    use_kernel: bool = True,
):
    """Training-path residual quantization with in-loop EMA codebook updates.

    Preserves the reference sequencing: at each depth, codes are found with
    the *current* weights, EMA stats accumulate, and the embedding is
    rewritten before the next depth reads it (critical for shared codebooks,
    where torch mutates the shared nn.Embedding between depth iterations —
    quantizations.py:131-142 called per depth in :261-268).
    """
    residual = x.astype(jnp.float32)
    aggregated = jnp.zeros_like(residual)
    quant_list, code_list = [], []

    embed = state.embed
    cluster_size = state.cluster_size
    embed_ema = state.embed_ema

    rngs = (
        jax.random.split(rng, config.depth)
        if rng is not None
        else [None] * config.depth
    )

    for d in range(config.depth):
        ci = config.codebook_index(d)
        n_embed_d = config.n_embed[d]
        cb = embed[ci][:n_embed_d]
        code = find_nearest(residual, cb, use_kernel=use_kernel)
        if config.ema:
            new_cb, new_cs, new_ema = _ema_update_one(
                cb,
                cluster_size[ci][:n_embed_d],
                embed_ema[ci][:n_embed_d],
                residual,
                code,
                decay=config.decay[d],
                eps=config.eps,
                restart_unused_codes=config.restart_unused_codes,
                rng=rngs[d],
                axis_name=axis_name,
            )
            # embed lookup uses pre-update weights (reference forward embeds
            # before _update_embedding, quantizations.py:131-142)
            quant = embed_lookup(cb, code)
            embed = embed.at[ci, :n_embed_d].set(new_cb)
            cluster_size = cluster_size.at[ci, :n_embed_d].set(new_cs)
            embed_ema = embed_ema.at[ci, :n_embed_d].set(new_ema)
        else:
            quant = embed_lookup(cb, code)
        residual = residual - quant
        aggregated = aggregated + quant
        quant_list.append(aggregated)
        code_list.append(code)

    new_state = CodebookState(embed=embed, cluster_size=cluster_size, embed_ema=embed_ema)
    return jnp.stack(quant_list), jnp.stack(code_list, axis=-1), new_state


def rq_bottleneck_forward(
    z_e: jax.Array,
    state: CodebookState,
    config: QuantizerConfig,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    use_kernel: bool = True,
):
    """Full bottleneck: space-to-depth -> RQ -> STE -> commitment loss.

    Returns (z_q [B,H,W,D] with straight-through grads, commitment_loss,
    codes [B,h,w,depth], new_state). Mirrors RQBottleneck.forward
    (quantizations.py:273-295).
    """
    x = to_code_shape(z_e, config)
    if training and config.ema:
        quants, codes, new_state = quantize_train(
            jax.lax.stop_gradient(x), state, config, rng, axis_name, use_kernel=use_kernel
        )
    else:
        quants, codes = quantize(
            jax.lax.stop_gradient(x), state, config, use_kernel=use_kernel
        )
        new_state = state

    # cumulative commitment loss averaged over depths (:283-295)
    commitment_loss = jnp.mean(
        jnp.square(x[None].astype(jnp.float32) - jax.lax.stop_gradient(quants))
    )

    quants_trunc = to_latent_shape(quants[-1], config)
    z_q = z_e + jax.lax.stop_gradient(quants_trunc.astype(z_e.dtype) - z_e)
    return z_q, commitment_loss, codes, new_state


# ---------------------------------------------------------------------------
# code -> embedding decode paths
# ---------------------------------------------------------------------------


def embed_code(codes: jax.Array, state: CodebookState, config: QuantizerConfig) -> jax.Array:
    """Sum-over-depth decode, to latent shape (reference embed_code :297-311)."""
    total = None
    for d in range(config.depth):
        cb = state.embed[config.codebook_index(d)][: config.n_embed[d]]
        e = embed_lookup(cb, codes[..., d])
        total = e if total is None else total + e
    return to_latent_shape(total, config)


def embed_code_with_depth(
    codes: jax.Array, state: CodebookState, config: QuantizerConfig
) -> jax.Array:
    """Per-depth embeddings [..., depth, embed_dim], NOT summed
    (reference embed_code_with_depth :313-334, used by stage-2)."""
    embs = []
    for d in range(config.depth):
        cb = state.embed[config.codebook_index(d)][: config.n_embed[d]]
        embs.append(embed_lookup(cb, codes[..., d]))
    return jnp.stack(embs, axis=-2)


def embed_partial_code(
    codes: jax.Array,
    code_idx: int,
    state: CodebookState,
    config: QuantizerConfig,
    decode_type: str = "select",
) -> jax.Array:
    """Decode with a subset of depths (reference embed_partial_code :336-369)."""
    embs = embed_code_with_depth(codes, state, config)
    if decode_type == "select":
        out = embs[..., code_idx, :]
    elif decode_type == "add":
        out = jnp.sum(embs[..., : code_idx + 1, :], axis=-2)
    else:
        raise NotImplementedError(decode_type)
    return to_latent_shape(out, config)


def get_soft_codes(
    z_e: jax.Array,
    state: CodebookState,
    config: QuantizerConfig,
    temp: float = 1.0,
    stochastic: bool = False,
    rng: Optional[jax.Array] = None,
):
    """softmax(-dist/temp) soft targets + (stochastic) codes for stage-2
    training (reference get_soft_codes :371-400)."""
    x = to_code_shape(z_e, config)
    residual = jax.lax.stop_gradient(x).astype(jnp.float32)
    soft_list, code_list = [], []
    rngs = (
        jax.random.split(rng, config.depth) if rng is not None else [None] * config.depth
    )
    for d in range(config.depth):
        cb = state.embed[config.codebook_index(d)][: config.n_embed[d]]
        dist = compute_distances(residual, cb)
        soft = jax.nn.softmax(-dist / temp, axis=-1)
        if stochastic:
            assert rngs[d] is not None
            code = jax.random.categorical(rngs[d], -dist / temp, axis=-1).astype(jnp.int32)
        else:
            code = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        quant = embed_lookup(cb, code)
        residual = residual - quant
        soft_list.append(soft)
        code_list.append(code)
    return jnp.stack(soft_list, axis=-2), jnp.stack(code_list, axis=-1)
