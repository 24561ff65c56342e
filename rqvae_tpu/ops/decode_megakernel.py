"""Pallas TPU megakernel: ONE kernel for a whole decode transformer layer.

Motivation (COVERAGE r2 / VERDICT r2 item 4): the separately-shipped Pallas
decode kernels each win locally but COMBINING them regresses — adjacent
opaque custom calls serialize each other's DMA, so the loop sits at an
aggregate-bandwidth equilibrium. This kernel fuses the ENTIRE layer step

    h   = LN1(x);  q,k,v = h @ wqkv + bqkv          (phase A: 3 grid steps)
    y   = softmax(q.K/sqrt(hs)).V  (+ self term)    (phase B: cache chunks,
                                                     online/flash softmax)
    x2  = x + y @ wo + bo;  h2 = LN2(x2)            (phase C: 1 step)
    out = x2 + gelu(h2 @ w1 + b1) @ w2 + b2         (phase D: H chunks)

into ONE pallas_call whose grid runs the phases back-to-back: weights AND
the KV cache ride a single double-buffered DMA pipeline (the grid
prefetches step i+1's blocks during step i's compute, across phase
boundaries), eliminating the cross-custom-call DMA serialization. Fixed
blocks (x, wo, norms, biases) are fetched once in the prologue and revisited
free (same block index -> no new DMA).

Returns (out [B, C], k_new [B, C], v_new [B, C]); the caller updates the
cache (same contract as model.stack_step_unrolled's XLA path). The cache
window W must be a multiple of the t-chunk (the sampler's tile-aligned
cache allocation guarantees 16-alignment); rows >= cur_len are masked.

Math matches the XLA path: one-pass fp32 LN statistics, bf16 MXU operands
with fp32 accumulation via the 0/1 head-segment matrix (exact for bf16),
fp32 online softmax, A&S erf gelu (Mosaic has no erf lowering).
Reference semantics: attention block of
/root/reference/rqvae/models/rqtransformer/attentions.py:140-181.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.ops.decode_layer_kernel import _ln, _gelu, _prec

NEG_INF = -1e30  # fp32 running-max init (avoid inf-inf NaNs in corrections)


def _mega_kernel(
    cur_len_ref,  # scalar prefetch [1]
    # inputs
    x_ref, lns1_ref, lnb1_ref, wqkv_ref, bqkv_ref,
    kc_ref, vc_ref, seg_ref,
    wo_ref, bo_ref, lns2_ref, lnb2_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    # outputs
    out_ref, k_out_ref, v_out_ref,
    # scratch
    h1_s, q_s, k_s, v_s, m_s, l_s, y_s, x2_s, h2_s, acc_s,
    *, n_head: int, t_chunk: int, n_t: int, n_m: int, gelu_version: str,
):
    i = pl.program_id(0)
    cur_len = cur_len_ref[0]
    cd = x_ref.dtype
    prec = _prec(cd)
    B, C = x_ref.shape
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    seg = seg_ref[:].astype(cd)  # [C, nh] 0/1

    # ---- phase A: LN1 + q/k/v (one [C, C] weight chunk per step) --------
    @pl.when(i == 0)
    def _():
        h1_s[:] = _ln(x_ref[:], lns1_ref[:], lnb1_ref[:], cd)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        y_s[:] = jnp.zeros_like(y_s)

    @pl.when(i < 3)
    def _():
        proj = (
            jnp.dot(
                h1_s[:], wqkv_ref[:],
                preferred_element_type=jnp.float32, precision=prec,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(cd)

        @pl.when(i == 0)
        def _():
            q_s[:] = proj

        @pl.when(i == 1)
        def _():
            k_s[:] = proj
            k_out_ref[:] = proj

        @pl.when(i == 2)
        def _():
            v_s[:] = proj
            v_out_ref[:] = proj

    # ---- phase B: flash attention over cache chunks ---------------------
    @pl.when((i >= 3) & (i < 3 + n_t))
    def _():
        t = i - 3
        kc = kc_ref[:]  # [B, tc, C]
        vc = vc_ref[:]
        prod = (kc * q_s[:][:, None, :]).reshape(B * t_chunk, C)
        s = (
            jnp.dot(prod, seg, preferred_element_type=jnp.float32, precision=prec)
            .reshape(B, t_chunk, n_head)
            * scale
        )
        rows = t * t_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, t_chunk, 1), 1
        )
        s = jnp.where(rows < cur_len, s, NEG_INF)

        m_new = jnp.maximum(m_s[:], jnp.max(s, axis=1))  # [B, nh]
        corr = jnp.exp(m_s[:] - m_new)
        e = jnp.exp(s - m_new[:, None, :])  # [B, tc, nh]
        e = jnp.where(rows < cur_len, e, 0.0)
        l_s[:] = l_s[:] * corr + jnp.sum(e, axis=1)
        e_lanes = (
            jnp.dot(
                e.reshape(B * t_chunk, n_head).astype(cd), seg.T,
                preferred_element_type=jnp.float32, precision=prec,
            )
            .astype(cd)
            .reshape(B, t_chunk, C)
        )
        corr_lanes = jnp.dot(
            corr, seg_ref[:].T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, C]
        y_s[:] = y_s[:] * corr_lanes + jnp.sum(
            vc * e_lanes, axis=1, dtype=jnp.float32
        )

        # self-attention term folded in once, with the last chunk (m_new is
        # the running max INCLUDING this chunk; m_s still holds the previous
        # value at this point)
        @pl.when(t == n_t - 1)
        def _():
            s_self = (
                jnp.dot(
                    (k_s[:] * q_s[:]), seg,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                * scale
            )  # [B, nh]
            m_fin = jnp.maximum(m_new, s_self)
            corr2 = jnp.exp(m_new - m_fin)
            e_self = jnp.exp(s_self - m_fin)
            l_s[:] = l_s[:] * corr2 + e_self
            corr2_lanes = jnp.dot(
                corr2, seg_ref[:].T.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            es_lanes = jnp.dot(
                e_self, seg_ref[:].T.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            y_s[:] = y_s[:] * corr2_lanes + v_s[:].astype(jnp.float32) * es_lanes
            m_s[:] = m_fin

        @pl.when(t < n_t - 1)
        def _():
            m_s[:] = m_new

    # ---- phase C: attention normalize + out-proj + residual + LN2 -------
    @pl.when(i == 3 + n_t)
    def _():
        l_lanes = jnp.dot(
            l_s[:], seg_ref[:].T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        att = (y_s[:] / l_lanes).astype(cd)
        proj = jnp.dot(
            att, wo_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
        x2_s[:] = x2
        h2_s[:] = _ln(x2, lns2_ref[:], lnb2_ref[:], cd)
        acc_s[:] = jnp.zeros_like(acc_s)

    # ---- phase D: MLP over H chunks -------------------------------------
    @pl.when(i >= 4 + n_t)
    def _():
        t1 = jnp.dot(
            h2_s[:], w1_ref[:], preferred_element_type=jnp.float32, precision=prec
        ) + b1_ref[:].astype(jnp.float32)
        t1 = _gelu(t1, gelu_version).astype(cd)
        acc_s[:] += jnp.dot(
            t1, w2_ref[:], preferred_element_type=jnp.float32, precision=prec
        )

        @pl.when(i == 3 + n_t + n_m)
        def _():
            out_ref[:] = x2_s[:] + (
                acc_s[:] + b2_ref[:].astype(jnp.float32)
            ).astype(cd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "t_window", "t_chunk", "m_chunk", "gelu_version", "interpret"
    ),
)
def decode_layer_step(
    x,  # [B, C] current token activations
    k_cache, v_cache,  # [B, T, C]
    cur_len,  # int32 scalar
    ln1_scale, ln1_bias,
    wqkv, bqkv,  # [C, 3C], [3C]
    wo, bo,
    ln2_scale, ln2_bias,
    w1, b1, w2, b2,  # [C, H], [H], [H, C], [C]
    n_head: int,
    t_window: int | None = None,
    t_chunk: int = 16,
    m_chunk: int = 1536,
    gelu_version: str = "v1",
    interpret: bool = False,
):
    """One fused decode-layer step. Returns (out [B,C], k_new, v_new)."""
    B, C = x.shape
    T = k_cache.shape[1]
    W = T if t_window is None else min(t_window, T)
    assert W % t_chunk == 0, (W, t_chunk)
    H = w1.shape[1]
    if H % min(m_chunk, H):
        from rqvae_tpu.ops.decode_layer_kernel import _pick_chunk

        m_chunk = _pick_chunk(H, m_chunk)
    m_chunk = min(m_chunk, H)
    n_t = W // t_chunk
    n_m = H // m_chunk
    n_steps = 3 + n_t + 1 + n_m

    hs = C // n_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 1)
    ).astype(jnp.float32)

    kernel = functools.partial(
        _mega_kernel, n_head=n_head, t_chunk=t_chunk, n_t=n_t, n_m=n_m,
        gelu_version=gelu_version,
    )
    f32 = jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i, s: (0, 0)),  # x
            pl.BlockSpec((C,), lambda i, s: (0,)),  # ln1 scale
            pl.BlockSpec((C,), lambda i, s: (0,)),  # ln1 bias
            # wqkv [C, C] column chunks: q, k, v on steps 0/1/2
            pl.BlockSpec(
                (C, C), lambda i, s: (0, jnp.minimum(i, 2))
            ),
            pl.BlockSpec((1, C), lambda i, s: (0, jnp.minimum(i, 2))),
            # cache chunks
            pl.BlockSpec(
                (B, t_chunk, C),
                lambda i, s: (0, jnp.clip(i - 3, 0, n_t - 1), 0),
            ),
            pl.BlockSpec(
                (B, t_chunk, C),
                lambda i, s: (0, jnp.clip(i - 3, 0, n_t - 1), 0),
            ),
            pl.BlockSpec((C, n_head), lambda i, s: (0, 0)),  # seg
            pl.BlockSpec((C, C), lambda i, s: (0, 0)),  # wo
            pl.BlockSpec((1, C), lambda i, s: (0, 0)),  # bo
            pl.BlockSpec((C,), lambda i, s: (0,)),  # ln2 scale
            pl.BlockSpec((C,), lambda i, s: (0,)),  # ln2 bias
            pl.BlockSpec(
                (C, m_chunk),
                lambda i, s: (0, jnp.clip(i - 4 - n_t, 0, n_m - 1)),
            ),
            pl.BlockSpec(
                (1, m_chunk),
                lambda i, s: (0, jnp.clip(i - 4 - n_t, 0, n_m - 1)),
            ),
            pl.BlockSpec(
                (m_chunk, C),
                lambda i, s: (jnp.clip(i - 4 - n_t, 0, n_m - 1), 0),
            ),
            pl.BlockSpec((1, C), lambda i, s: (0, 0)),  # b2
        ],
        out_specs=[
            pl.BlockSpec((B, C), lambda i, s: (0, 0)),
            pl.BlockSpec((B, C), lambda i, s: (0, 0)),
            pl.BlockSpec((B, C), lambda i, s: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, C), x.dtype),  # h1
            pltpu.VMEM((B, C), x.dtype),  # q
            pltpu.VMEM((B, C), x.dtype),  # k
            pltpu.VMEM((B, C), x.dtype),  # v
            pltpu.VMEM((B, n_head), f32),  # m
            pltpu.VMEM((B, n_head), f32),  # l
            pltpu.VMEM((B, C), f32),  # y
            pltpu.VMEM((B, C), x.dtype),  # x2
            pltpu.VMEM((B, C), x.dtype),  # h2
            pltpu.VMEM((B, C), f32),  # acc
        ],
    )
    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        # full cache buffers: the grid only ever touches chunk indices
        # < n_t, so the W-window is a BlockSpec prefix read — NO slice copy
        cur_len.reshape(1), x, ln1_scale, ln1_bias, wqkv,
        bqkv.reshape(1, 3 * C),
        k_cache, v_cache, seg,
        wo, bo.reshape(1, C), ln2_scale, ln2_bias,
        w1, b1.reshape(1, H), w2, b2.reshape(1, C),
    )
    return out, k_new, v_new
