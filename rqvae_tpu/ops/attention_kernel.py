"""Pallas TPU kernel: fused single-token (decode) multi-head attention.

For the AR sampling hot loop: given the new token's q/k/v [B, C] and the
layer's KV cache [B, T, C] (heads merged in the last dim — unpadded layout),
computes softmax(q.k / sqrt(hs)) . v in ONE kernel: no head-split relayouts,
no [B, nh, T, hs] intermediates in HBM, fp32 score/softmax accumulation in
VMEM. Head boundaries are handled with masked lane reductions (hs=64 packs
two heads per 128-lane register; general hs supported via the segment mask).

Returns y [B, C]. The new token attends cache positions < cur_len plus
itself (the sampler writes k/v into the cache separately).

STATUS — SHIPPED at EVERY batch where legal (auto dispatch,
model.resolve_attn_backend; RQVAE_TPU_DECODE_ATTN overrides), in the
`decode_attention_update` fused-cache-write form. History: the round-1
fp32 variant measured SLOWER than XLA (VPU-bound, 7.04 vs 5.77 ms/sample
body-only at bs100) because the caller jnp.pad-ed the 98MB cache — a full
copy per call. The round-2 rewrite is pad-free (ragged batch via
boundary-block masking, phase windows as BlockSpec prefix reads) with bf16
compute and fp32 softmax: it streams the cache at ~740 GB/s (91% of the
819 GB/s paper peak) vs ~600 for XLA (tools/exp_pallas_attn.py) — but as a
READ-ONLY kernel it only won end-to-end at bs >= ~300 (below that the
decode loop sits at an aggregate-bandwidth equilibrium and the local win
shifts into weight-prefetch waits). Round 3 fused the KV-cache WRITE into
the kernel (`decode_attention_update`, input_output_aliases — kills XLA's
~96us/layer (8,128)-tile read-modify-write dynamic-update-slice), after
which the kernel wins at every measured batch (AR vs best XLA ms/sample:
bs100 5.39/6.08, bs200 3.87/4.92, bs500 3.71/4.94). The q8 variants
additionally store the cache int8 with per-(token,head) scales.
Equivalence: tests/test_attention_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(
    cur_len_ref,  # SMEM [1]
    q_ref,  # [BT, C]
    k_new_ref,  # [BT, C]
    v_new_ref,  # [BT, C]
    kc_ref,  # [BT, T, C]
    vc_ref,  # [BT, T, C]
    seg_ref,  # [C, n_head] constant 0/1 head-segment matrix
    y_ref,  # [BT, C]
    *,
    n_head: int,
    t_max: int,
):
    """Head segmentation via constant 0/1 matmuls: Mosaic cannot split the
    1536-lane dim into (n_head, hs) vectors, but prod @ Seg[C, nh] (MXU)
    computes the per-head partial sums, and w @ Seg^T broadcasts the softmax
    weights back onto the lanes."""
    cur_len = cur_len_ref[0]
    _attn_math(
        cur_len, q_ref[:], k_new_ref[:], v_new_ref[:], kc_ref[:], vc_ref[:],
        seg_ref[:], y_ref, n_head=n_head, t_max=t_max,
    )


def _decode_attn_kernel_stacked(
    scal_ref,  # SMEM [2]: (cur_len, layer)
    q_ref, k_new_ref, v_new_ref,
    kc_ref,  # [1, BT, T, C] (layer block selected by index_map)
    vc_ref,
    seg_ref,
    y_ref,
    *,
    n_head: int,
    t_max: int,
):
    _attn_math(
        scal_ref[0], q_ref[:], k_new_ref[:], v_new_ref[:], kc_ref[0],
        vc_ref[0], seg_ref[:], y_ref, n_head=n_head, t_max=t_max,
    )


def _attn_math(cur_len, q, k_new, v_new, kc, vc, seg, y_ref, *, n_head, t_max):
    """Compute dtype follows the cache dtype (bf16 on the fast path): scores
    accumulate in fp32 via the seg-matrix MXU dot over bf16 products —
    numerically identical to the XLA VPU path, which also forms bf16
    products before its fp32-accumulated reduction (model.py
    attention_decode). Softmax stays fp32. Avoiding full-tile fp32
    conversions keeps VMEM/VPU traffic at ~2 passes per cache tensor (the
    earlier all-fp32 kernel was VPU-bound and slower than XLA)."""
    BT, C = q.shape
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    cd = kc.dtype
    segc = seg.astype(cd)
    # bf16 operands MAC exactly (fp32 accumulate); fp32 operands need
    # HIGHEST or the MXU's default bf16 truncation costs ~1e-2
    prec = jax.lax.Precision.HIGHEST if cd == jnp.float32 else None

    prod = (kc * q[:, None, :].astype(cd)).reshape(BT * t_max, C)
    s_past = (
        jnp.dot(
            prod, segc, preferred_element_type=jnp.float32, precision=prec
        ).reshape(BT, t_max, n_head)
        * scale
    )
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
    s_past = jnp.where(t_ids < cur_len, s_past, -jnp.inf)

    s_self = (
        jnp.dot(
            (k_new * q).astype(cd), segc,
            preferred_element_type=jnp.float32, precision=prec,
        )[:, None, :]
        * scale
    )  # [BT, 1, nh]

    m = jnp.maximum(jnp.max(s_past, axis=1, keepdims=True), s_self)
    e_past = jnp.exp(s_past - m)
    e_self = jnp.exp(s_self - m)
    denom = jnp.sum(e_past, axis=1, keepdims=True) + e_self
    w_past = (e_past / denom).astype(cd)  # [BT, T, nh]
    w_self = e_self / denom  # [BT, 1, nh] fp32 (tiny)

    # broadcast weights back to lanes and reduce over T (fp32 accumulation)
    # Mosaic requires 32-bit matmul accumulation; cast down after
    w_lanes = (
        jnp.dot(
            w_past.reshape(BT * t_max, n_head), segc.T,
            preferred_element_type=jnp.float32, precision=prec,
        )
        .astype(cd)
        .reshape(BT, t_max, C)
    )
    y = jnp.sum(vc * w_lanes, axis=1, dtype=jnp.float32)  # [BT, C]
    ws_lanes = jnp.dot(
        w_self[:, 0, :], seg.T,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [BT, C] (w_self is fp32; seg is 0/1 — keep the product exact)
    y = y + v_new.astype(jnp.float32) * ws_lanes
    y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "interpret")
)
def decode_attention_stacked(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C]
    v_new: jax.Array,  # [B, C]
    k_cache: jax.Array,  # [L, B, T, C] FULL stacked cache
    v_cache: jax.Array,  # [L, B, T, C]
    layer: jax.Array,  # int32 scalar: which layer's cache to read
    cur_len: jax.Array,  # int32 scalar
    n_head: int,
    b_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention reading ONE layer of the stacked KV cache in place.

    Inside the layer `lax.scan`, slicing `cache[l]` for a plain kernel call
    makes XLA materialise a [B, T, C] copy per layer (the
    constant_dynamic-slice fusion measured at ~35us/layer-step on v5e, ~25%
    of decode-layer time). Here the layer index is a prefetched scalar used
    by the BlockSpec index_map, so tiles DMA straight from the big cache
    buffer — no copy, no extra HBM traffic."""
    L, B, T, C = k_cache.shape
    assert B % b_tile == 0, (
        f"stacked cache path requires B % b_tile == 0 (cache is not padded); "
        f"got B={B}, b_tile={b_tile}"
    )
    Bp = B

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (Bp // b_tile,)
    kernel = functools.partial(_decode_attn_kernel_stacked, n_head=n_head, t_max=T)
    scalars = jnp.stack([cur_len.astype(jnp.int32), layer.astype(jnp.int32)])
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, s: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, s: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, s: (i, 0)),
                pl.BlockSpec((1, b_tile, T, C), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((1, b_tile, T, C), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b_tile, C), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, C), q.dtype),
        interpret=interpret,
    )(scalars, q, k_new, v_new, k_cache, v_cache, seg)
    return y[:B]


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "t_window", "interpret")
)
def decode_attention(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C]
    v_new: jax.Array,  # [B, C]
    k_cache: jax.Array,  # [B, T, C]
    v_cache: jax.Array,  # [B, T, C]
    cur_len: jax.Array,  # int32 scalar
    n_head: int,
    b_tile: int = 8,
    t_window: int | None = None,  # static: attend cache[:, :t_window] only
    interpret: bool = False,
) -> jax.Array:
    """NO padding/slicing of the operands: a ragged batch is handled by
    Pallas boundary-block masking (each row's output depends only on its own
    row, so garbage in the dead tail rows is harmless), and a phase window
    is a BlockSpec prefix read of the full cache buffer. Materializing
    either as jnp.pad/slice costs a full cache copy per call — measured
    3.6x the kernel's own runtime at bs500 (tools/exp_pallas_attn.py)."""
    B, C = q.shape
    T = k_cache.shape[1]
    W = T if t_window is None else min(t_window, T)

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (pl.cdiv(B, b_tile),)
    kernel = functools.partial(_decode_attn_kernel, n_head=n_head, t_max=W)
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, C), q.dtype),
        # cap Mosaic's VMEM claim: by default a kernel may reserve the whole
        # VMEM, which evicts XLA's async weight-prefetch buffers around every
        # call and serializes the decode loop on slice-done waits (traced at
        # bs100: +76ms/iter of sync weight waits vs the fused XLA path)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(cur_len.reshape(1), q, k_new, v_new, k_cache, v_cache, seg)
    return y


# ---------------------------------------------------------------------------
# fused cache update: the kernel writes the new k/v row itself
# ---------------------------------------------------------------------------
#
# The bs500 xplane trace showed the XLA cache write dominating the decode
# glue: each dynamic-update-slice of a [B, 1, C] row into the (8,128)-tiled
# [B, T, C] cache costs ~96us at B=500 (sublane read-modify-write
# amplification of every touched tile), 2 per layer -> ~505 ms/batch, plus
# associated whole-cache copies. The kernel already holds the update row's
# sublane-aligned neighborhood in VMEM (the attention window covers
# cur_len), so emitting the updated rows costs ONE tile-aligned block write
# per cache — no RMW, no extra read — with `input_output_aliases` making
# the write in-place in HBM (the XLA DUS disappears entirely).


def _decode_attn_kernel_update(
    cur_len_ref,  # SMEM [1]
    q_ref, k_new_ref, v_new_ref, kc_ref, vc_ref, seg_ref,
    y_ref,
    k_upd_ref,  # [BT, SUB, C] block of the aliased k cache at the
    v_upd_ref,  # sublane-aligned window containing row cur_len
    *,
    n_head: int,
    t_max: int,
    sub: int,
):
    cur_len = cur_len_ref[0]
    _attn_math(
        cur_len, q_ref[:], k_new_ref[:], v_new_ref[:], kc_ref[:], vc_ref[:],
        seg_ref[:], y_ref, n_head=n_head, t_max=t_max,
    )
    # replace row (cur_len % sub) of the window with the new k/v; the other
    # sub-1 rows pass through unchanged (full-tile write, no RMW)
    start = (cur_len // sub) * sub
    row = jax.lax.broadcasted_iota(jnp.int32, (1, sub, 1), 1)
    is_new = row == (cur_len - start)
    old_k = kc_ref[:, pl.dslice(start, sub), :]
    old_v = vc_ref[:, pl.dslice(start, sub), :]
    k_upd_ref[:] = jnp.where(
        is_new, k_new_ref[:][:, None, :].astype(k_upd_ref.dtype), old_k
    )
    v_upd_ref[:] = jnp.where(
        is_new, v_new_ref[:][:, None, :].astype(v_upd_ref.dtype), old_v
    )


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "t_window", "interpret")
)
def decode_attention_update(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C]
    v_new: jax.Array,  # [B, C]
    k_cache: jax.Array,  # [B, T, C] — DONATED: aliased into output 1
    v_cache: jax.Array,  # [B, T, C] — DONATED: aliased into output 2
    cur_len: jax.Array,  # int32 scalar
    n_head: int,
    b_tile: int = 8,
    t_window: int | None = None,
    interpret: bool = False,
):
    """decode_attention + in-kernel cache write at row cur_len.

    Returns (y [B, C], k_cache', v_cache') where the caches are updated IN
    PLACE (input_output_aliases) — callers must treat the passed caches as
    consumed, exactly like the reference's torch in-place cache update
    (attentions.py cached k/v assignment). Requires the attention window to
    cover row cur_len (guaranteed by the sampler: window >= cur_len + 1)
    and a sublane-tile-aligned cache T (the sampler allocates t_alloc
    rounded up)."""
    B, C = q.shape
    T = k_cache.shape[1]
    W = T if t_window is None else min(t_window, T)
    sub = 16 if k_cache.dtype == jnp.bfloat16 else 8
    assert T % sub == 0, f"cache T={T} must be {sub}-row aligned"

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (pl.cdiv(B, b_tile),)
    kernel = functools.partial(
        _decode_attn_kernel_update, n_head=n_head, t_max=W, sub=sub
    )
    y, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec(
                    (b_tile, sub, C), lambda i, s: (i, s[0] // sub, 0)
                ),
                pl.BlockSpec(
                    (b_tile, sub, C), lambda i, s: (i, s[0] // sub, 0)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, C), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # operand indices include the scalar prefetch (0); caches are
        # operands 4/5 -> outputs 1/2
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(cur_len.reshape(1), q, k_new, v_new, k_cache, v_cache, seg)
    return y, k_out, v_out


# ---------------------------------------------------------------------------
# int8-quantized KV cache (weight-streaming analogue for the CACHE bytes)
# ---------------------------------------------------------------------------
#
# At large batch the KV cache dominates AR HBM traffic (bs500 1.4B: cache
# ~60% of bytes/position vs weights ~40%). Storing K/V as int8 with one
# bf16 scale per (token, head) halves the cache stream the same way the q8
# dense kernels halve the weight stream. The trick that keeps dequant off
# the critical path: scales NEVER touch the [B, T, C] tiles — the K scale
# folds into the score matrix and the V scale into the softmax-weight
# matrix, both [B, T, n_head] (= 1/hs of the cache tile), so the kernel
# adds two tiny elementwise multiplies instead of a full-tile dequant.
# The current position's k/v stay unquantized (exact self-attention path).


def quantize_kv(x: jax.Array, n_head: int):
    """Per-(row, head) symmetric int8 quantization of a [B, C] k or v row.

    Returns (q int8 [B, C], scale fp32 [B, n_head]) with
    q * scale ~= x (absmax scaling, round-to-nearest)."""
    B, C = x.shape
    hs = C // n_head
    xh = x.reshape(B, n_head, hs).astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xh), axis=-1) / 127.0, 1e-8)
    q = (
        jnp.round(xh / scale[..., None])
        .astype(jnp.int8)
        .reshape(B, C)
    )
    return q, scale


def dequantize_cache(q: jax.Array, scale: jax.Array, n_head: int) -> jax.Array:
    """[B, T, C] int8 + [B, T, n_head] scales -> bf16 cache (XLA fallback /
    test emulation; materializes the full cache, so only for correctness
    paths — the kernel never does this)."""
    B, T, C = q.shape
    hs = C // n_head
    x = q.astype(jnp.float32).reshape(B, T, n_head, hs) * scale.astype(
        jnp.float32
    )[..., None]
    return x.reshape(B, T, C).astype(jnp.bfloat16)


def _attn_math_q8(
    cur_len, q, k_new, v_new, kq, ks, vq, vs, seg, y_ref, *, n_head, t_max
):
    y = _attn_math_q8_val(
        cur_len, q, k_new, v_new, kq, ks, vq, vs, seg,
        n_head=n_head, t_max=t_max,
    )
    y_ref[:] = y.astype(y_ref.dtype)


def _attn_math_q8_val(
    cur_len, q, k_new, v_new, kq, ks, vq, vs, seg, *, n_head, t_max
):
    """Same op order as _attn_math with the cache int8: products form in
    bf16 (int8 values <= 127 are exact in bf16), K scales fold into the
    fp32 score matrix, V scales fold into the softmax weights before the
    lane broadcast. Returns y fp32 [BT, C]."""
    BT, C = q.shape
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    cd = jnp.bfloat16
    segc = seg.astype(cd)

    prod = (kq.astype(cd) * q[:, None, :].astype(cd)).reshape(BT * t_max, C)
    s_past = (
        jnp.dot(prod, segc, preferred_element_type=jnp.float32).reshape(
            BT, t_max, n_head
        )
        * ks.astype(jnp.float32)
        * scale
    )
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
    s_past = jnp.where(t_ids < cur_len, s_past, -jnp.inf)

    s_self = (
        jnp.dot(
            (k_new * q).astype(cd), segc, preferred_element_type=jnp.float32
        )[:, None, :]
        * scale
    )

    m = jnp.maximum(jnp.max(s_past, axis=1, keepdims=True), s_self)
    e_past = jnp.exp(s_past - m)
    e_self = jnp.exp(s_self - m)
    denom = jnp.sum(e_past, axis=1, keepdims=True) + e_self
    w_past = ((e_past / denom) * vs.astype(jnp.float32)).astype(cd)
    w_self = e_self / denom

    w_lanes = (
        jnp.dot(
            w_past.reshape(BT * t_max, n_head), segc.T,
            preferred_element_type=jnp.float32,
        )
        .astype(cd)
        .reshape(BT, t_max, C)
    )
    y = jnp.sum(vq.astype(cd) * w_lanes, axis=1, dtype=jnp.float32)
    ws_lanes = jnp.dot(
        w_self[:, 0, :], seg.T,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return y + v_new.astype(jnp.float32) * ws_lanes


def _decode_attn_kernel_q8(
    cur_len_ref, q_ref, k_new_ref, v_new_ref, kq_ref, ks_ref, vq_ref, vs_ref,
    seg_ref, y_ref, *, n_head, t_max
):
    _attn_math_q8(
        cur_len_ref[0], q_ref[:], k_new_ref[:], v_new_ref[:], kq_ref[:],
        ks_ref[:], vq_ref[:], vs_ref[:], seg_ref[:], y_ref,
        n_head=n_head, t_max=t_max,
    )


def _quantize_row_in_kernel(x, seg, n_head):
    """quantize_kv for one [BT, C] row inside the kernel — identical math
    (fp32 absmax/127 clamp, per-lane fp32 divide, round-to-nearest-even)
    so the in-kernel write is bit-equal to the XLA quantize+update path.
    The per-head absmax uses static lane slices (hs-aligned); the scale
    broadcast back to lanes rides the 0/1 seg matrix on the MXU."""
    BT, C = x.shape
    hs = C // n_head
    x32 = x.astype(jnp.float32)
    ax = jnp.abs(x32)
    amax = jnp.concatenate(
        [
            jnp.max(ax[:, h * hs:(h + 1) * hs], axis=1, keepdims=True)
            for h in range(n_head)
        ],
        axis=1,
    )  # [BT, nh]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    scale_lanes = jnp.dot(
        scale, seg.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BT, C] (seg is 0/1 -> exact per-lane scale)
    qv = jnp.round(x32 / scale_lanes).astype(jnp.int8)
    return qv, scale


def _decode_attn_kernel_q8_update(
    cur_len_ref, q_ref, k_new_ref, v_new_ref, kq_ref, ks_ref, vq_ref, vs_ref,
    seg_ref, y_ref, kq_upd_ref, ks_upd_ref, vq_upd_ref, vs_upd_ref,
    *, n_head, t_max
):
    cur_len = cur_len_ref[0]
    _attn_math_q8(
        cur_len, q_ref[:], k_new_ref[:], v_new_ref[:], kq_ref[:],
        ks_ref[:], vq_ref[:], vs_ref[:], seg_ref[:], y_ref,
        n_head=n_head, t_max=t_max,
    )
    seg = seg_ref[:]
    kq_new, ks_new = _quantize_row_in_kernel(k_new_ref[:], seg, n_head)
    vq_new, vs_new = _quantize_row_in_kernel(v_new_ref[:], seg, n_head)
    # int8 cache rows: 32-row tile window; scales: same window (bf16 tile 16
    # divides 32)
    start = (cur_len // 32) * 32
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    is_new = row == (cur_len - start)
    kq_upd_ref[:] = jnp.where(
        is_new, kq_new[:, None, :], kq_ref[:, pl.dslice(start, 32), :]
    )
    vq_upd_ref[:] = jnp.where(
        is_new, vq_new[:, None, :], vq_ref[:, pl.dslice(start, 32), :]
    )
    ks_upd_ref[:] = jnp.where(
        is_new,
        ks_new[:, None, :].astype(ks_upd_ref.dtype),
        ks_ref[:, pl.dslice(start, 32), :],
    )
    vs_upd_ref[:] = jnp.where(
        is_new,
        vs_new[:, None, :].astype(vs_upd_ref.dtype),
        vs_ref[:, pl.dslice(start, 32), :],
    )


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "t_window", "interpret")
)
def decode_attention_q8_update(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C]
    v_new: jax.Array,  # [B, C]
    kq_cache: jax.Array,  # [B, T, C] int8 — DONATED (aliased)
    ks_cache: jax.Array,  # [B, T, n_head] — DONATED
    vq_cache: jax.Array,  # [B, T, C] int8 — DONATED
    vs_cache: jax.Array,  # [B, T, n_head] — DONATED
    cur_len: jax.Array,
    n_head: int,
    b_tile: int = 8,
    t_window: int | None = None,
    interpret: bool = False,
):
    """decode_attention_q8 + in-kernel row quantization and cache write.

    The q8 cache was measured END-TO-END NEUTRAL with XLA-side
    quantize+update (the per-position quantize/4x dynamic-update-slice
    cost what the halved read saved); fusing both into the kernel removes
    that cost the same way decode_attention_update does for bf16.
    Returns (y, kq', ks', vq', vs') with all four caches updated in
    place. Requires T % 32 == 0 and the window to cover cur_len."""
    B, C = q.shape
    T = kq_cache.shape[1]
    W = T if t_window is None else min(t_window, T)
    assert T % 32 == 0, f"int8 cache T={T} must be 32-row aligned"

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (pl.cdiv(B, b_tile),)
    kernel = functools.partial(
        _decode_attn_kernel_q8_update, n_head=n_head, t_max=W
    )
    y, kq2, ks2, vq2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec(
                    (b_tile, 32, C), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, n_head), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, C), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, n_head), lambda i, s: (i, s[0] // 32, 0)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, C), q.dtype),
            jax.ShapeDtypeStruct(kq_cache.shape, kq_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, ks_cache.dtype),
            jax.ShapeDtypeStruct(vq_cache.shape, vq_cache.dtype),
            jax.ShapeDtypeStruct(vs_cache.shape, vs_cache.dtype),
        ],
        # operand indices include the scalar prefetch (0)
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(cur_len.reshape(1), q, k_new, v_new, kq_cache, ks_cache, vq_cache,
      vs_cache, seg)
    return y, kq2, ks2, vq2, vs2


def _decode_attn_kernel_q8_update_wo(
    cur_len_ref, q_ref, k_new_ref, v_new_ref, kq_ref, ks_ref, vq_ref, vs_ref,
    seg_ref, x_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    x2_ref, h2_ref, kq_upd_ref, ks_upd_ref, vq_upd_ref, vs_upd_ref,
    wo_s,
    *, n_head, t_max,
):
    """q8 fused-write attention + the attention OUTPUT PROJECTION, residual
    add and LN2 folded in (VERDICT r4 item 1c: one custom-call boundary
    reduction). The attention value y never round-trips HBM: it feeds the
    wo MXU dot in VMEM; the kernel emits x2 (residual stream) and
    h2 = LN2(x2) directly, so the XLA side starts at the MLP — the standalone
    wo dot AND the ln2 convert_reduce fusion disappear from the layer."""
    from rqvae_tpu.ops.decode_layer_kernel import _ln

    i = pl.program_id(0)
    cur_len = cur_len_ref[0]
    cd = jnp.bfloat16

    # dequantize wo ONCE per call (revisited blocks are not re-fetched;
    # the convert is ~2.5us for 1536^2 on the VPU, 13x that if done per
    # batch tile)
    @pl.when(i == 0)
    def _():
        wo_s[:] = wo_ref[:].astype(cd)

    y = _attn_math_q8_val(
        cur_len, q_ref[:], k_new_ref[:], v_new_ref[:], kq_ref[:],
        ks_ref[:], vq_ref[:], vs_ref[:], seg_ref[:],
        n_head=n_head, t_max=t_max,
    )
    proj = jnp.dot(
        y.astype(cd), wo_s[:], preferred_element_type=jnp.float32
    ) * wos_ref[:].astype(jnp.float32)
    x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    x2_ref[:] = x2
    h2_ref[:] = _ln(x2, lns_ref[0], lnb_ref[0], h2_ref.dtype)

    seg = seg_ref[:]
    kq_new, ks_new = _quantize_row_in_kernel(k_new_ref[:], seg, n_head)
    vq_new, vs_new = _quantize_row_in_kernel(v_new_ref[:], seg, n_head)
    start = (cur_len // 32) * 32
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    is_new = row == (cur_len - start)
    kq_upd_ref[:] = jnp.where(
        is_new, kq_new[:, None, :], kq_ref[:, pl.dslice(start, 32), :]
    )
    vq_upd_ref[:] = jnp.where(
        is_new, vq_new[:, None, :], vq_ref[:, pl.dslice(start, 32), :]
    )
    ks_upd_ref[:] = jnp.where(
        is_new,
        ks_new[:, None, :].astype(ks_upd_ref.dtype),
        ks_ref[:, pl.dslice(start, 32), :],
    )
    vs_upd_ref[:] = jnp.where(
        is_new,
        vs_new[:, None, :].astype(vs_upd_ref.dtype),
        vs_ref[:, pl.dslice(start, 32), :],
    )


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "t_window", "interpret")
)
def decode_attention_q8_update_wo(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C]
    v_new: jax.Array,  # [B, C]
    kq_cache: jax.Array,  # [B, T, C] int8 — DONATED (aliased)
    ks_cache: jax.Array,  # [B, T, n_head] — DONATED
    vq_cache: jax.Array,  # [B, T, C] int8 — DONATED
    vs_cache: jax.Array,  # [B, T, n_head] — DONATED
    cur_len: jax.Array,
    x: jax.Array,  # [B, C] residual stream entering the layer
    wo: jax.Array,  # [C, C] int8 (QuantizedWeight.q) or bf16/fp32
    wo_scale: jax.Array,  # [C] per-output-column scale (ones for plain wo)
    bo: jax.Array,  # [C]
    ln2_scale: jax.Array,  # [C]
    ln2_bias: jax.Array,  # [C]
    n_head: int,
    b_tile: int = 8,
    t_window: int | None = None,
    interpret: bool = False,
):
    """decode_attention_q8_update + wo projection + residual + LN2 in ONE
    custom call. Returns (x2, h2, kq', ks', vq', vs'): x2 is the residual
    stream after the attention block, h2 = LN2(x2) ready for the MLP.
    Same cache-aliasing contract as decode_attention_q8_update."""
    B, C = q.shape
    T = kq_cache.shape[1]
    W = T if t_window is None else min(t_window, T)
    assert T % 32 == 0, f"int8 cache T={T} must be 32-row aligned"

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (pl.cdiv(B, b_tile),)
    kernel = functools.partial(
        _decode_attn_kernel_q8_update_wo, n_head=n_head, t_max=W
    )
    x2, h2, kq2, ks2, vq2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, *_: (0, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((C, C), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec(
                    (b_tile, 32, C), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, n_head), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, C), lambda i, s: (i, s[0] // 32, 0)
                ),
                pl.BlockSpec(
                    (b_tile, 32, n_head), lambda i, s: (i, s[0] // 32, 0)
                ),
            ],
            scratch_shapes=[pltpu.VMEM((C, C), jnp.bfloat16)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct(kq_cache.shape, kq_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, ks_cache.dtype),
            jax.ShapeDtypeStruct(vq_cache.shape, vq_cache.dtype),
            jax.ShapeDtypeStruct(vs_cache.shape, vs_cache.dtype),
        ],
        # operand indices include the scalar prefetch (0); caches are
        # operands 4-7 -> outputs 2-5
        input_output_aliases={4: 2, 5: 3, 6: 4, 7: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(cur_len.reshape(1), q, k_new, v_new, kq_cache, ks_cache, vq_cache,
      vs_cache, seg, x, wo, wo_scale.reshape(1, C), bo.reshape(1, C),
      ln2_scale.reshape(1, C), ln2_bias.reshape(1, C))
    return x2, h2, kq2, ks2, vq2, vs2


@functools.partial(
    jax.jit, static_argnames=("n_head", "b_tile", "t_window", "interpret")
)
def decode_attention_q8(
    q: jax.Array,  # [B, C]
    k_new: jax.Array,  # [B, C] (unquantized current position)
    v_new: jax.Array,  # [B, C]
    kq_cache: jax.Array,  # [B, T, C] int8
    ks_cache: jax.Array,  # [B, T, n_head] scales
    vq_cache: jax.Array,  # [B, T, C] int8
    vs_cache: jax.Array,  # [B, T, n_head]
    cur_len: jax.Array,
    n_head: int,
    b_tile: int = 8,
    t_window: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """decode_attention with the cache streamed as int8 + per-(token, head)
    scales: half the cache HBM bytes, same ragged-batch masking and phase
    windows."""
    B, C = q.shape
    T = kq_cache.shape[1]
    W = T if t_window is None else min(t_window, T)

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    grid = (pl.cdiv(B, b_tile),)
    kernel = functools.partial(_decode_attn_kernel_q8, n_head=n_head, t_max=W)
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, C), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((b_tile, W, n_head), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((C, n_head), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b_tile, C), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        cur_len.reshape(1), q, k_new, v_new, kq_cache, ks_cache, vq_cache,
        vs_cache, seg,
    )
    return y
