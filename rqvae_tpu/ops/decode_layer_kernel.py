"""Pallas TPU kernels for the dense half of a decode transformer layer.

The AR decode step is HBM-bandwidth bound: per layer-step the weights
(wqkv 14MB + wo 4.7 + w1/w2 38MB bf16 at C=1536) dominate traffic, and the
bs500 xplane trace shows XLA's decode-shaped matmul+LayerNorm fusions
running at ~1.9x their weight-stream floor (convert_reduce_fusion, 26% of
AR device time; see COVERAGE.md round-2 notes). These kernels stream the
weight matrices through VMEM with pallas' grid double-buffering while the
small activation block stays resident, so the matmul chain rides the DMA
rate (~740 GB/s measured for the attention kernel, tools/exp_pallas_attn):

- fused_ln_qkv:   h = LN(x); qkv = h @ wqkv + bqkv       (grid over 3C cols)
- fused_proj_mlp: x2 = x + y @ wo + bo; h2 = LN(x2);
                  out = x2 + gelu(h2 @ w1 + b1) @ w2 + b2 (grid over H)

Math mirrors model.stack_step_unrolled's XLA path (one-pass fp32 LayerNorm
statistics, bf16 matmuls with fp32 MXU accumulation; the hidden-chunked
MLP accumulates partial column blocks in fp32 — within 1-2 bf16 ulps of
XLA's fusion rounding). Reference semantics: attention block of
/root/reference/rqvae/models/rqtransformer/attentions.py:140-181.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _ln(x, scale, bias, out_dtype):
    """One-pass fp32 LayerNorm (matches model.layer_norm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    msq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        out_dtype
    )


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7.

    Mosaic has no erf/erfc lowering; exp is supported. fp32 throughout —
    the resulting gelu differs from jax.nn.gelu(approximate=False) by
    < 1e-6 over the activation range, inside every parity tolerance."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(x, version: str):
    if version == "v1":
        return x * 0.5 * (1.0 + _erf(x * (2.0**-0.5)))  # exact-erf gelu
    return x * jax.nn.sigmoid(1.702 * x)


def _prec(dtype):
    # bf16 operands MAC exactly on the MXU (fp32 accumulate); fp32 operands
    # need HIGHEST or the default bf16 truncation costs ~1e-2
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _pick_chunk(n: int, target: int = 1536) -> int:
    """Largest lane-aligned divisor of n not exceeding target (n % 128 == 0
    whenever C does, so 128 always qualifies)."""
    best = 0
    c = 128
    while c <= min(target, n):
        if n % c == 0:
            best = c
        c += 128
    return best or n


def _ln_qkv_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, h_s):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_s[:] = _ln(x_ref[:], lns_ref[:], lnb_ref[:], h_s.dtype)

    # bias added on the fp32 accumulator, ONE cast at the end — also keeps
    # the store dtype correct when operand dtypes are mixed (fp32 weights
    # with bf16 activations would otherwise promote the sum to fp32)
    o_ref[:] = (
        jnp.dot(
            h_s[:], w_ref[:],
            preferred_element_type=jnp.float32,
            precision=_prec(x_ref.dtype),
        )
        + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_ln_qkv(x, ln_scale, ln_bias, wqkv, bqkv, chunk=1536, interpret=False):
    """x [B, C] -> LN -> x @ wqkv + bqkv, wqkv [C, N] streamed in N-column
    chunks (N = 3C for fused QKV). Returns [B, N]."""
    B, C = x.shape
    N = wqkv.shape[1]
    if N % min(chunk, N):
        chunk = _pick_chunk(N, chunk)
    chunk = min(chunk, N)
    return pl.pallas_call(
        _ln_qkv_kernel,
        grid=(N // chunk,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, chunk), lambda i: (0, i)),
            # chunked 1D blocks trip Mosaic's window tiling -> pass as [1, N]
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv.reshape(1, N))


def _ln_qkv_q8_kernel(x_ref, lns_ref, lnb_ref, wq_ref, ws_ref, b_ref, o_ref, h_s):
    """int8 weight-streaming variant: wq chunks arrive as int8 (HALF the
    HBM/DMA bytes of bf16 — the decode step is weight-bandwidth bound),
    dequantized in VMEM into the MXU feed. int8 values are exact in bf16,
    and the per-output-channel scale applies to the fp32 accumulator, so
    the math matches the XLA path's (h @ q.astype(bf16)) * scale + b up to
    fusion rounding."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_s[:] = _ln(x_ref[:], lns_ref[:], lnb_ref[:], h_s.dtype)

    w = wq_ref[:].astype(h_s.dtype)
    acc = jnp.dot(
        h_s[:], w, preferred_element_type=jnp.float32, precision=_prec(h_s.dtype)
    )
    o_ref[:] = (
        acc * ws_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_ln_qkv_q8(
    x, ln_scale, ln_bias, wqkv_q, wqkv_scale, bqkv, chunk=1536, interpret=False
):
    """fused_ln_qkv for int8-quantized wqkv (model.QuantizedWeight): q
    [C, N] int8 streamed in N-column chunks, scale [..., 1, N] applied to
    the fp32 accumulator. Returns [B, N] in x.dtype."""
    B, C = x.shape
    N = wqkv_q.shape[1]
    if N % min(chunk, N):
        chunk = _pick_chunk(N, chunk)
    chunk = min(chunk, N)
    return pl.pallas_call(
        _ln_qkv_q8_kernel,
        grid=(N // chunk,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, ln_scale, ln_bias, wqkv_q,
        wqkv_scale.reshape(1, N), bqkv.reshape(1, N),
    )


def _ln_qkv_q8_ring_kernel(
    x_ref, lns_ref, lnb_ref, w_hbm, ws_ref, b_ref, o_ref,
    w_buf, sem, h_s,
    *, chunk: int, n_buf: int, nc: int,
):
    """int8 LN+QKV with an explicit n_buf-deep DMA ring.

    Same rationale as _proj_mlp_q8_ring_kernel: at int8 the column chunks
    are half the bytes of bf16, so pallas' 2-deep grid pipeline leaves DMA
    issue/ramp latency exposed — the explicit ring keeps n_buf - 1 chunk
    fills in flight during each MXU dot (measured on the isolated 16-layer
    chain, tools/exp_q8_pipeline.py qkv mode). wqkv stays in HBM
    (memory_space=ANY); the [C, chunk] int8 slices stream through the VMEM
    ring. Same op order as the grid kernel (_ln_qkv_q8_kernel):
    bit-identical in interpret mode."""
    cd = x_ref.dtype
    prec = _prec(cd)

    def dma(slot, j):
        return pltpu.make_async_copy(
            w_hbm.at[:, pl.dslice(j * chunk, chunk)], w_buf.at[slot],
            sem.at[slot],
        )

    for j in range(min(n_buf, nc)):
        dma(j, j).start()

    h_s[:] = _ln(x_ref[:], lns_ref[:], lnb_ref[:], cd)

    # static unroll: nc is a trace-time constant (3 at C=1536/N=4608
    # chunk=1536, 6 at the 3.8B's N=7680/chunk=1280)
    for j in range(nc):
        slot = j % n_buf
        dma(slot, j).wait()
        acc = jnp.dot(
            h_s[:], w_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        sl = pl.dslice(j * chunk, chunk)
        o_ref[:, sl] = (
            acc * ws_ref[:, sl].astype(jnp.float32)
            + b_ref[:, sl].astype(jnp.float32)
        ).astype(cd)
        if j + n_buf < nc:  # refill this slot AFTER the compute that read it
            dma(slot, j + n_buf).start()


@functools.partial(
    jax.jit, static_argnames=("chunk", "n_buf", "interpret")
)
def fused_ln_qkv_q8_ring(
    x, ln_scale, ln_bias, wqkv_q, wqkv_scale, bqkv,
    chunk=768, n_buf=3, interpret=False,
):
    """fused_ln_qkv_q8 with the explicit DMA ring (see
    _ln_qkv_q8_ring_kernel). chunk=768 / n_buf=3 measured best on the
    16-layer dependent QKV chain at bs100 (tools/exp_qkv_ring.py:
    grid 0.45 -> ring 0.43 ms, 252 -> 265 GB/s int8)."""
    B, C = x.shape
    N = wqkv_q.shape[1]
    if N % min(chunk, N):
        chunk = _pick_chunk(N, chunk)
    chunk = min(chunk, N)
    nc = N // chunk
    n_buf = min(n_buf, nc)
    # ring scratch + the resident output block must fit VMEM (same guard
    # rationale as the proj+MLP ring; the QKV ring is much smaller)
    ring_bytes = n_buf * C * chunk + B * N * x.dtype.itemsize + B * C * 4
    if ring_bytes > 100 * 1024 * 1024:
        raise ValueError(
            f"fused_ln_qkv_q8_ring: ring scratch {ring_bytes/2**20:.0f} MiB "
            f"exceeds the 100 MiB VMEM budget (C={C}, N={N}, chunk={chunk}, "
            f"n_buf={n_buf}) — pass a smaller chunk"
        )
    kern = functools.partial(
        _ln_qkv_q8_ring_kernel, chunk=chunk, n_buf=n_buf, nc=nc
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[vmem, vmem, vmem, hbm, vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, C, chunk), jnp.int8),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((B, C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_q, wqkv_scale.reshape(1, N), bqkv.reshape(1, N))


def _proj_mlp_kernel(
    x_ref, y_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref, x2_s, h_s, acc_s,
    *, gelu_version: str,
):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    prec = _prec(x_ref.dtype)

    @pl.when(i == 0)
    def _():
        proj = jnp.dot(
            y_ref[:], wo_ref[:], preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(x_ref.dtype)
        x2 = x_ref[:] + (proj + bo_ref[:])
        x2_s[:] = x2
        h_s[:] = _ln(x2, lns_ref[:], lnb_ref[:], h_s.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    t = jnp.dot(
        h_s[:], w1_ref[:], preferred_element_type=jnp.float32, precision=prec
    ) + b1_ref[:].astype(jnp.float32)
    t = _gelu(t, gelu_version).astype(x_ref.dtype)
    acc_s[:] += jnp.dot(
        t, w2_ref[:], preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(i == nc - 1)
    def _():
        m = (acc_s[:] + b2_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        o_ref[:] = x2_s[:] + m


@functools.partial(
    jax.jit, static_argnames=("gelu_version", "chunk", "interpret")
)
def fused_proj_mlp(
    x, y, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
    gelu_version="v1", chunk=1536, interpret=False,
):
    """Attention-output projection + residual + LN2 + MLP + residual:
      x2 = x + y @ wo + bo; out = x2 + gelu(LN(x2) @ w1 + b1) @ w2 + b2
    w1 [C, H] / w2 [H, C] streamed in H-chunks (double-buffered by the
    pallas grid pipeline); x/y/wo and the x2/h2/acc blocks stay in VMEM."""
    B, C = x.shape
    H = w1.shape[1]
    if H % min(chunk, H):
        chunk = _pick_chunk(H, chunk)
    chunk = min(chunk, H)
    kern = functools.partial(_proj_mlp_kernel, gelu_version=gelu_version)
    return pl.pallas_call(
        kern,
        grid=(H // chunk,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),  # b1 as [1, H]
            pl.BlockSpec((chunk, C), lambda i: (i, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, y, wo, bo, ln_scale, ln_bias, w1, b1.reshape(1, H), w2, b2)


def _proj_mlp_q8_ring_kernel(
    x_ref, y_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_hbm, w1s_ref, b1_ref, w2_hbm, w2s_ref, b2_ref, o_ref,
    w1_buf, w2_buf, sem1, sem2, x2_s, h_s, acc_s,
    *, gelu_version: str, chunk: int, n_buf: int, nc: int,
):
    """int8 proj+MLP with an explicit n_buf-deep DMA ring.

    pallas' default grid pipeline keeps only ONE chunk-fill in flight while
    one computes; at int8 the chunks are half the bytes of bf16, so the DMA
    issue/ramp latency is a 2x larger fraction of each transfer and the
    grid pipeline leaves ~13% on the floor (measured,
    tools/exp_q8_pipeline.py: grid 0.96 ms vs ring 0.84 on the 16-layer
    bs100 chain at chunk=768 n_buf=3; min-of-3 timing, 100-iter chains —
    30-iter chains are fetch-noise-dominated through the tunnel). Weights
    stay in HBM (memory_space=ANY); an n_buf-slot VMEM ring of manually
    issued copies keeps n_buf - 1 chunk-pairs in flight during compute.
    A chunk-contiguous prepacked layout measured NO further win (DMA rate
    is not stride-bound), so the weights keep their natural [C, H]/[H, C]
    layout. Same op order as the grid kernel: bit-identical in interpret
    mode; on TPU Mosaic's fp contraction differs by <=2 bf16 ulps
    (measured max|d| 0.0039 on unit-scale activations at C=1536)."""
    cd = x_ref.dtype
    prec = _prec(cd)

    def dma1(slot, j):
        return pltpu.make_async_copy(
            w1_hbm.at[:, pl.dslice(j * chunk, chunk)], w1_buf.at[slot],
            sem1.at[slot],
        )

    def dma2(slot, j):
        return pltpu.make_async_copy(
            w2_hbm.at[pl.dslice(j * chunk, chunk), :], w2_buf.at[slot],
            sem2.at[slot],
        )

    for j in range(min(n_buf, nc)):
        dma1(j, j).start()
        dma2(j, j).start()

    proj = jnp.dot(
        y_ref[:], wo_ref[:].astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    ) * wos_ref[:].astype(jnp.float32)
    x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
    x2_s[:] = x2
    h_s[:] = _ln(x2, lns_ref[:], lnb_ref[:], cd)
    acc_s[:] = jnp.zeros_like(acc_s)

    # static unroll: nc is a trace-time constant (8 at C=1536/H=6144, 16 at
    # the 3.8B's H=10240/chunk=640); VMEM headroom is checked in the wrapper
    for j in range(nc):
        slot = j % n_buf
        dma1(slot, j).wait()
        dma2(slot, j).wait()
        t = jnp.dot(
            h_s[:], w1_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        ) * w1s_ref[:, pl.dslice(j * chunk, chunk)].astype(jnp.float32) + b1_ref[
            :, pl.dslice(j * chunk, chunk)
        ].astype(jnp.float32)
        t = _gelu(t, gelu_version).astype(cd)
        acc_s[:] += jnp.dot(
            t, w2_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if j + n_buf < nc:  # refill this slot AFTER the compute that read it
            dma1(slot, j + n_buf).start()
            dma2(slot, j + n_buf).start()

    o_ref[:] = x2_s[:] + (
        acc_s[:] * w2s_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    ).astype(cd)


@functools.partial(
    jax.jit, static_argnames=("gelu_version", "chunk", "n_buf", "interpret")
)
def fused_proj_mlp_q8_ring(
    x, y, wo_q, wo_scale, bo, ln_scale, ln_bias,
    w1_q, w1_scale, b1, w2_q, w2_scale, b2,
    gelu_version="v1", chunk=768, n_buf=3, interpret=False,
):
    """fused_proj_mlp_q8 with the explicit DMA ring (the shipped int8
    pipeline; see _proj_mlp_q8_ring_kernel). chunk=768 / n_buf=3 measured
    best on the 16-layer bs100 chain (tools/exp_q8_pipeline.py)."""
    B, C = x.shape
    H = w1_q.shape[1]
    if H % min(chunk, H):
        chunk = _pick_chunk(H, chunk)
    chunk = min(chunk, H)
    nc = H // chunk
    n_buf = min(n_buf, nc)
    kern = functools.partial(
        _proj_mlp_q8_ring_kernel,
        gelu_version=gelu_version, chunk=chunk, n_buf=n_buf, nc=nc,
    )
    # ring scratch must fit VMEM alongside the resident blocks: n_buf int8
    # chunk-pairs (2*n_buf*chunk*C bytes) + wo (C*C) + x2/h/acc. Guard the
    # degenerate chunk==H case (H with no 128-aligned divisor <= target ->
    # _pick_chunk returns H, i.e. n_buf FULL copies of w1/w2 in VMEM).
    ring_bytes = 2 * n_buf * chunk * C + C * C + 3 * B * C * 4
    if ring_bytes > 100 * 1024 * 1024:
        raise ValueError(
            f"fused_proj_mlp_q8_ring: ring scratch {ring_bytes/2**20:.0f} MiB "
            f"exceeds the 100 MiB VMEM budget (C={C}, H={H}, chunk={chunk}, "
            f"n_buf={n_buf}) — pass a smaller chunk"
        )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[
            vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            hbm, vmem, vmem, hbm, vmem, vmem,
        ],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, C, chunk), jnp.int8),
            pltpu.VMEM((n_buf, chunk, C), jnp.int8),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, y, wo_q, wo_scale.reshape(1, C), bo, ln_scale, ln_bias,
        w1_q, w1_scale.reshape(1, H), b1.reshape(1, H),
        w2_q, w2_scale.reshape(1, C), b2.reshape(1, C),
    )


def _proj_mlp_q8_kernel(
    x_ref, y_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, b2_ref, o_ref,
    x2_s, h_s, acc_s,
    *, gelu_version: str,
):
    """int8 weight-streaming proj+MLP: wo/w1/w2 chunks arrive int8 (half
    the DMA bytes), dequantized in VMEM; per-output-channel scales applied
    on the fp32 accumulators (w2's scale is per final output column —
    constant across H-chunks, applied once at the end)."""
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    cd = x_ref.dtype
    prec = _prec(cd)

    @pl.when(i == 0)
    def _():
        proj = jnp.dot(
            y_ref[:], wo_ref[:].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        ) * wos_ref[:].astype(jnp.float32)
        x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
        x2_s[:] = x2
        h_s[:] = _ln(x2, lns_ref[:], lnb_ref[:], h_s.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    t = jnp.dot(
        h_s[:], w1_ref[:].astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    ) * w1s_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    t = _gelu(t, gelu_version).astype(cd)
    acc_s[:] += jnp.dot(
        t, w2_ref[:].astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(i == nc - 1)
    def _():
        m = (
            acc_s[:] * w2s_ref[:].astype(jnp.float32)
            + b2_ref[:].astype(jnp.float32)
        ).astype(cd)
        o_ref[:] = x2_s[:] + m


@functools.partial(
    jax.jit, static_argnames=("gelu_version", "chunk", "interpret")
)
def fused_proj_mlp_q8(
    x, y, wo_q, wo_scale, bo, ln_scale, ln_bias,
    w1_q, w1_scale, b1, w2_q, w2_scale, b2,
    gelu_version="v1", chunk=1536, interpret=False,
):
    """fused_proj_mlp for int8-quantized wo/w1/w2 (model.QuantizedWeight).
    w1_q [C, H] / w2_q [H, C] streamed int8 in H-chunks; wo_q [C, C] int8
    resident. Scales are the per-output-channel QuantizedWeight scales."""
    B, C = x.shape
    H = w1_q.shape[1]
    if H % min(chunk, H):
        chunk = _pick_chunk(H, chunk)
    chunk = min(chunk, H)
    kern = functools.partial(_proj_mlp_q8_kernel, gelu_version=gelu_version)
    return pl.pallas_call(
        kern,
        grid=(H // chunk,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((B, C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
            pl.BlockSpec((chunk, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), x.dtype),
            pltpu.VMEM((B, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, y, wo_q, wo_scale.reshape(1, C), bo, ln_scale, ln_bias,
        w1_q, w1_scale.reshape(1, H), b1.reshape(1, H),
        w2_q, w2_scale.reshape(1, C), b2.reshape(1, C),
    )
