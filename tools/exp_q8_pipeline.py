"""int8 DMA pipeline-depth experiment (VERDICT r3 item 3).

The shipped q8 weight-streaming kernels (ops/decode_layer_kernel.py::*_q8)
sit at 71-81% of the measured int8 XLA floor while the bf16 kernels reach
90-94% of theirs. Round-3 attributed the residual to "halved per-DMA block
bytes, inherent" — but that verdict rests on pallas' DEFAULT grid pipeline,
which is 2-deep (one buffer computing, one filling). With only 4 grid steps
(H=6144 / chunk 1536) a 2-deep pipeline exposes the DMA issue+ramp latency
of every other chunk; int8 halves the bytes per chunk, doubling the
latency:transfer ratio.

This kernel takes explicit control: w1/w2 stay in HBM (memory_space=ANY)
and an N-slot VMEM ring of manually-issued async copies keeps N-1 chunk
DMAs in flight while one chunk computes. Sweep N x chunk on the same
HBM-resident dependent 16-layer chain as tools/exp_w8a8.py and compare
against the shipped grid-pipeline kernel.

Run: python tools/exp_q8_pipeline.py [bs]      (real TPU)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import decode_layer_kernel as DL

B = int(sys.argv[1]) if len(sys.argv) > 1 else 100
C, H, L = 1536, 6144, 16
dt = jnp.bfloat16


def _pad(s):
    return f"{s:9s}"


def _proj_mlp_q8_ring_kernel(
    x_ref, y_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_hbm, w1s_ref, b1_ref, w2_hbm, w2s_ref, b2_ref, o_ref,
    w1_buf, w2_buf, sem1, sem2, x2_s, h_s, acc_s,
    *, gelu_version: str, chunk: int, n_buf: int,
):
    """proj+MLP with an explicit n_buf-deep DMA ring for the w1/w2 chunks.

    w1_hbm [C, H] / w2_hbm [H, C] int8 live in HBM; slot ring w1_buf
    [n_buf, C, chunk] / w2_buf [n_buf, chunk, C]. At steady state n_buf - 1
    chunk-pairs are in flight while one computes (the default grid pipeline
    caps this at 1)."""
    cd = x_ref.dtype
    prec = DL._prec(cd)
    nc = H // chunk  # static

    def dma1(slot, j):
        return pltpu.make_async_copy(
            w1_hbm.at[:, pl.ds(j * chunk, chunk)], w1_buf.at[slot], sem1.at[slot]
        )

    def dma2(slot, j):
        return pltpu.make_async_copy(
            w2_hbm.at[pl.ds(j * chunk, chunk), :], w2_buf.at[slot], sem2.at[slot]
        )

    # prologue: fill the ring
    for j in range(min(n_buf, nc)):
        dma1(j, j).start()
        dma2(j, j).start()

    proj = jnp.dot(
        y_ref[:], wo_ref[:].astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    ) * wos_ref[:].astype(jnp.float32)
    x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
    x2_s[:] = x2
    h_s[:] = DL._ln(x2, lns_ref[:], lnb_ref[:], cd)
    acc_s[:] = jnp.zeros_like(acc_s)

    for j in range(nc):  # static unroll: nc is small (2-8)
        slot = j % n_buf
        dma1(slot, j).wait()
        dma2(slot, j).wait()
        t = jnp.dot(
            h_s[:], w1_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        ) * w1s_ref[:, pl.ds(j * chunk, chunk)].astype(jnp.float32) + b1_ref[
            :, pl.ds(j * chunk, chunk)
        ].astype(jnp.float32)
        t = DL._gelu(t, gelu_version).astype(cd)
        acc_s[:] += jnp.dot(
            t, w2_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # refill this slot for chunk j + n_buf (after the compute that read it)
        if j + n_buf < nc:
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
    gelu_version="v1", chunk=1536, n_buf=4, interpret=False,
):
    Bx, Cx = x.shape
    Hx = w1_q.shape[1]
    assert Hx % chunk == 0
    kern = functools.partial(
        _proj_mlp_q8_ring_kernel,
        gelu_version=gelu_version, chunk=chunk, n_buf=n_buf,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[
            vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            hbm, vmem, vmem, hbm, vmem, vmem,
        ],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((Bx, Cx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, Cx, chunk), jnp.int8),
            pltpu.VMEM((n_buf, chunk, Cx), jnp.int8),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((Bx, Cx), x.dtype),
            pltpu.VMEM((Bx, Cx), x.dtype),
            pltpu.VMEM((Bx, Cx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, y, wo_q, wo_scale.reshape(1, Cx), bo, ln_scale, ln_bias,
        w1_q, w1_scale.reshape(1, Hx), b1.reshape(1, Hx),
        w2_q, w2_scale.reshape(1, Cx), b2.reshape(1, Cx),
    )


def _proj_mlp_q8_packed_kernel(
    x_ref, y_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_hbm, w1s_ref, b1_ref, w2_hbm, w2s_ref, b2_ref, o_ref,
    w1_buf, w2_buf, sem1, sem2, x2_s, h_s, acc_s,
    *, gelu_version: str, chunk: int, n_buf: int, nc: int,
):
    """Ring pipeline over PREPACKED chunk-contiguous weights: w1 arrives as
    [nc, C, chunk] (each chunk one contiguous HBM block -> one large-burst
    DMA instead of C strided 1536-byte rows), w2 as [nc, chunk, C] (already
    contiguous in the plain layout; packed for symmetry)."""
    cd = x_ref.dtype
    prec = DL._prec(cd)

    def dma1(slot, j):
        return pltpu.make_async_copy(w1_hbm.at[j], w1_buf.at[slot], sem1.at[slot])

    def dma2(slot, j):
        return pltpu.make_async_copy(w2_hbm.at[j], w2_buf.at[slot], sem2.at[slot])

    for j in range(min(n_buf, nc)):
        dma1(j, j).start()
        dma2(j, j).start()

    proj = jnp.dot(
        y_ref[:], wo_ref[:].astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    ) * wos_ref[:].astype(jnp.float32)
    x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
    x2_s[:] = x2
    h_s[:] = DL._ln(x2, lns_ref[:], lnb_ref[:], cd)
    acc_s[:] = jnp.zeros_like(acc_s)

    for j in range(nc):
        slot = j % n_buf
        dma1(slot, j).wait()
        dma2(slot, j).wait()
        t = jnp.dot(
            h_s[:], w1_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        ) * w1s_ref[:, pl.ds(j * chunk, chunk)].astype(jnp.float32) + b1_ref[
            :, pl.ds(j * chunk, chunk)
        ].astype(jnp.float32)
        t = DL._gelu(t, gelu_version).astype(cd)
        acc_s[:] += jnp.dot(
            t, w2_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if j + n_buf < nc:
            dma1(slot, j + n_buf).start()
            dma2(slot, j + n_buf).start()

    o_ref[:] = x2_s[:] + (
        acc_s[:] * w2s_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    ).astype(cd)


@functools.partial(
    jax.jit, static_argnames=("gelu_version", "chunk", "n_buf", "interpret")
)
def fused_proj_mlp_q8_packed(
    x, y, wo_q, wo_scale, bo, ln_scale, ln_bias,
    w1_packed, w1_scale, b1, w2_packed, w2_scale, b2,
    gelu_version="v1", chunk=1536, n_buf=4, interpret=False,
):
    """w1_packed [nc, C, chunk] int8, w2_packed [nc, chunk, C] int8."""
    Bx, Cx = x.shape
    nc = w1_packed.shape[0]
    Hx = nc * chunk
    kern = functools.partial(
        _proj_mlp_q8_packed_kernel,
        gelu_version=gelu_version, chunk=chunk, n_buf=n_buf, nc=nc,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[
            vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            hbm, vmem, vmem, hbm, vmem, vmem,
        ],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((Bx, Cx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, Cx, chunk), jnp.int8),
            pltpu.VMEM((n_buf, chunk, Cx), jnp.int8),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((Bx, Cx), x.dtype),
            pltpu.VMEM((Bx, Cx), x.dtype),
            pltpu.VMEM((Bx, Cx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, y, wo_q, wo_scale.reshape(1, Cx), bo, ln_scale, ln_bias,
        w1_packed, w1_scale.reshape(1, Hx), b1.reshape(1, Hx),
        w2_packed, w2_scale.reshape(1, Cx), b2.reshape(1, Cx),
    )


def _stream_probe_kernel(
    w1_hbm, w2_hbm, o_ref, w1_buf, w2_buf, sem1, sem2, acc_s,
    *, chunk: int, n_buf: int, nc: int, mode: str,
):
    """Isolation probe over the same chunk stream as the real kernel.
    mode='dma': DMA all chunks, touch one lane per chunk (pure DMA rate).
    mode='dequant': DMA + full int8->bf16 convert + row-reduce (VPU rate,
    no MXU dot)."""

    def dma1(slot, j):
        return pltpu.make_async_copy(w1_hbm.at[j], w1_buf.at[slot], sem1.at[slot])

    def dma2(slot, j):
        return pltpu.make_async_copy(w2_hbm.at[j], w2_buf.at[slot], sem2.at[slot])

    for j in range(min(n_buf, nc)):
        dma1(j, j).start()
        dma2(j, j).start()
    acc_s[:] = jnp.zeros_like(acc_s)
    for j in range(nc):
        slot = j % n_buf
        dma1(slot, j).wait()
        dma2(slot, j).wait()
        if mode == "dma":
            # touch one sublane row per buffer — forces the wait, ~no VPU
            acc_s[:] += w1_buf[slot, :1, :128].astype(jnp.float32).sum()
            acc_s[:] += w2_buf[slot, :1, :128].astype(jnp.float32).sum()
        else:  # dequant: full-chunk convert at the real kernel's VPU cost
            acc_s[:] += jnp.sum(
                w1_buf[slot].astype(jnp.bfloat16).astype(jnp.float32),
                axis=0, keepdims=True,
            )[:, :128]
            acc_s[:] += jnp.sum(
                w2_buf[slot].astype(jnp.bfloat16).astype(jnp.float32),
                axis=0, keepdims=True,
            )[:, :128]
        if j + n_buf < nc:
            dma1(slot, j + n_buf).start()
            dma2(slot, j + n_buf).start()
    o_ref[:] = acc_s[:]


@functools.partial(jax.jit, static_argnames=("chunk", "n_buf", "mode"))
def stream_probe(w1_packed, w2_packed, chunk=1536, n_buf=4, mode="dma"):
    nc = w1_packed.shape[0]
    Cx = w1_packed.shape[1]
    kern = functools.partial(
        _stream_probe_kernel, chunk=chunk, n_buf=n_buf, nc=nc, mode=mode
    )
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    # dma32: the same HBM bytes arrive pre-viewed as int32 ([.., chunk//4])
    # — the DMA fills (8,128)-tiled int32 VMEM instead of (32,128)-tiled
    # int8, isolating the int8 tile-packing cost from the raw byte rate
    sdt = w1_packed.dtype
    s1_shape = (n_buf,) + w1_packed.shape[1:]
    s2_shape = (n_buf,) + w2_packed.shape[1:]
    return pl.pallas_call(
        kern,
        in_specs=[hbm, hbm],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(s1_shape, sdt),
            pltpu.VMEM(s2_shape, sdt),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((1, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(w1_packed, w2_packed)


def _ablate_ring_kernel(
    h_ref, w1_hbm, w1s_ref, w2_hbm, w2s_ref, o_ref,
    w1_buf, w2_buf, sem1, sem2, acc_s,
    *, chunk: int, n_buf: int, nc: int, use_gelu: bool, use_scale: bool,
):
    """MLP-only ring (no wo/LN prologue): isolates DMA vs dequant vs gelu
    vs scale. Works for int8 or bf16 weight streams (buf dtype = hbm dtype)."""
    cd = h_ref.dtype
    prec = DL._prec(cd)

    def dma1(slot, j):
        return pltpu.make_async_copy(w1_hbm.at[j], w1_buf.at[slot], sem1.at[slot])

    def dma2(slot, j):
        return pltpu.make_async_copy(w2_hbm.at[j], w2_buf.at[slot], sem2.at[slot])

    for j in range(min(n_buf, nc)):
        dma1(j, j).start()
        dma2(j, j).start()
    acc_s[:] = jnp.zeros_like(acc_s)
    for j in range(nc):
        slot = j % n_buf
        dma1(slot, j).wait()
        dma2(slot, j).wait()
        t = jnp.dot(
            h_ref[:], w1_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if use_scale:
            t = t * w1s_ref[:, pl.ds(j * chunk, chunk)].astype(jnp.float32)
        if use_gelu:
            t = DL._gelu(t, "v1")
        t = t.astype(cd)
        acc_s[:] += jnp.dot(
            t, w2_buf[slot].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if j + n_buf < nc:
            dma1(slot, j + n_buf).start()
            dma2(slot, j + n_buf).start()
    o_ref[:] = acc_s[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("chunk", "n_buf", "use_gelu", "use_scale")
)
def ablate_ring(h, w1_packed, w1_scale, w2_packed, w2_scale,
                chunk=1536, n_buf=4, use_gelu=True, use_scale=True):
    Bx, Cx = h.shape
    nc = w1_packed.shape[0]
    Hx = nc * chunk
    wdt = w1_packed.dtype
    kern = functools.partial(
        _ablate_ring_kernel, chunk=chunk, n_buf=n_buf, nc=nc,
        use_gelu=use_gelu, use_scale=use_scale,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[vmem, hbm, vmem, hbm, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((Bx, Cx), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, Cx, chunk), wdt),
            pltpu.VMEM((n_buf, chunk, Cx), wdt),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.VMEM((Bx, Cx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(h, w1_packed, w1_scale.reshape(1, Hx), w2_packed, w2_scale.reshape(1, -1))


def pack_w1(w1_q, chunk):
    nc = w1_q.shape[1] // chunk
    return jnp.stack([w1_q[:, j * chunk:(j + 1) * chunk] for j in range(nc)])


def pack_w2(w2_q, chunk):
    nc = w2_q.shape[0] // chunk
    return jnp.stack([w2_q[j * chunk:(j + 1) * chunk, :] for j in range(nc)])


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, C)).astype(dt)
    y = jax.random.normal(ks[1], (B, C)).astype(dt)
    lns = jnp.ones((C,))
    lnb = jnp.zeros((C,))
    bo = jnp.zeros((C,), dt)
    b1 = jnp.zeros((H,), dt)
    b2 = jnp.zeros((C,), dt)

    wos = [M._quantize_weight(jax.random.normal(k, (C, C)) * 0.05)
           for k in jax.random.split(ks[2], L)]
    w1s = [M._quantize_weight(jax.random.normal(k, (C, H)) * 0.05)
           for k in jax.random.split(ks[3], L)]
    w2s = [M._quantize_weight(jax.random.normal(k, (H, C)) * 0.05)
           for k in jax.random.split(ks[4], L)]

    ITERS = int(os.environ.get("EXP_ITERS", "30"))
    bytes_q8 = L * (C * C + 2 * C * H)

    def bench(fn, *args):
        np.asarray(fn(*args))  # compile
        best = float("inf")
        for _ in range(3):  # tunnel fetch latency has ~40 ms spikes: min-of-3
            t0 = time.time()
            np.asarray(fn(*args))
            best = min(best, time.time() - t0)
        return best / ITERS

    @jax.jit
    def chain_q8(x, y, wos, w1s, w2s):
        def one(x, _):
            for wo, w1, w2 in zip(wos, w1s, w2s):
                x = DL.fused_proj_mlp_q8(
                    x, y, wo.q, wo.scale, bo, lns, lnb,
                    w1.q, w1.scale, b1, w2.q, w2.scale, b2,
                )
            return x, ()
        return jax.lax.scan(one, x, None, length=ITERS)[0].sum()

    def make_chain_ring(chunk, n_buf):
        @jax.jit
        def chain(x, y, wos, w1s, w2s):
            def one(x, _):
                for wo, w1, w2 in zip(wos, w1s, w2s):
                    x = fused_proj_mlp_q8_ring(
                        x, y, wo.q, wo.scale, bo, lns, lnb,
                        w1.q, w1.scale, b1, w2.q, w2.scale, b2,
                        chunk=chunk, n_buf=n_buf,
                    )
                return x, ()
            return jax.lax.scan(one, x, None, length=ITERS)[0].sum()
        return chain

    t0 = bench(chain_q8, x, y, wos, w1s, w2s)
    print(f"q8 grid-pipeline (shipped): {t0*1e3:7.2f} ms  "
          f"{bytes_q8/t0/1e9:6.0f} GB/s (int8 bytes)", flush=True)

    # numeric check of the ring kernel vs the shipped one
    o_ref = DL.fused_proj_mlp_q8(
        x, y, wos[0].q, wos[0].scale, bo, lns, lnb,
        w1s[0].q, w1s[0].scale, b1, w2s[0].q, w2s[0].scale, b2,
    )
    o_ring = fused_proj_mlp_q8_ring(
        x, y, wos[0].q, wos[0].scale, bo, lns, lnb,
        w1s[0].q, w1s[0].scale, b1, w2s[0].q, w2s[0].scale, b2,
    )
    d = np.abs(np.asarray(o_ring, np.float32) - np.asarray(o_ref, np.float32))
    print(f"ring vs shipped: mean|d| {d.mean():.6f} max|d| {d.max():.6f}",
          flush=True)

    skip_sweeps = bool(os.environ.get("EXP_SKIP_SWEEPS"))
    for chunk in ((), (1536, 768, 512))[not skip_sweeps]:
        for n_buf in (2, 3, 4, 6):
            if (H // chunk) < n_buf:
                continue
            try:
                t = bench(make_chain_ring(chunk, n_buf), x, y, wos, w1s, w2s)
                print(
                    f"q8 ring chunk={chunk:5d} n_buf={n_buf}: {t*1e3:7.2f} ms  "
                    f"{bytes_q8/t/1e9:6.0f} GB/s (int8 bytes)", flush=True,
                )
            except Exception as e:  # noqa: BLE001 — sweep survives bad configs
                print(f"q8 ring chunk={chunk:5d} n_buf={n_buf}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # ---- prepacked chunk-contiguous layout: is the low int8 rate the
    # strided w1 chunk DMA (1536-byte rows at stride H)? ------------------
    def make_chain_packed(chunk, n_buf):
        w1p = [pack_w1(w.q, chunk) for w in w1s]
        w2p = [pack_w2(w.q, chunk) for w in w2s]

        @jax.jit
        def chain(x, y, wos, w1ps, w2ps, w1ss, w2ss):
            def one(x, _):
                for wo, w1, w2, s1, s2 in zip(wos, w1ps, w2ps, w1ss, w2ss):
                    x = fused_proj_mlp_q8_packed(
                        x, y, wo.q, wo.scale, bo, lns, lnb,
                        w1, s1, b1, w2, s2, b2,
                        chunk=chunk, n_buf=n_buf,
                    )
                return x, ()
            return jax.lax.scan(one, x, None, length=ITERS)[0].sum()

        return chain, w1p, w2p

    # numeric check once
    chain_p, w1p0, w2p0 = make_chain_packed(1536, 2)
    o_p = fused_proj_mlp_q8_packed(
        x, y, wos[0].q, wos[0].scale, bo, lns, lnb,
        w1p0[0], w1s[0].scale, b1, w2p0[0], w2s[0].scale, b2,
        chunk=1536, n_buf=2,
    )
    dp = np.abs(np.asarray(o_p, np.float32) - np.asarray(o_ref, np.float32))
    print(f"packed vs shipped: mean|d| {dp.mean():.6f} max|d| {dp.max():.6f}",
          flush=True)

    for chunk in ((), (1536, 768, 3072))[not skip_sweeps]:
        for n_buf in (2, 3, 4):
            if (H // chunk) < n_buf:
                continue
            try:
                chain, w1p, w2p = make_chain_packed(chunk, n_buf)
                t = bench(
                    chain, x, y, wos, w1p, w2p,
                    [w.scale for w in w1s], [w.scale for w in w2s],
                )
                print(
                    f"q8 PACKED chunk={chunk:5d} n_buf={n_buf}: {t*1e3:7.2f} ms  "
                    f"{bytes_q8/t/1e9:6.0f} GB/s (int8 bytes)", flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"q8 PACKED chunk={chunk:5d} n_buf={n_buf}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # ---- isolation probes: pure DMA rate vs DMA+dequant rate over the
    # SAME 16-layer chunk stream (separates the engine from the VPU) ------
    bytes_probe = L * 2 * C * H  # w1 + w2 only (no wo) per layer
    skip_probes = bool(os.environ.get("EXP_SKIP_PROBES"))
    for mode in (() if skip_probes else ("dma", "dequant")):
        for chunk, n_buf in ((1536, 4), (768, 4)):
            w1p = [pack_w1(w.q, chunk) for w in w1s]
            w2p = [pack_w2(w.q, chunk) for w in w2s]

            @jax.jit
            def probe_chain(w1ps, w2ps, _m=mode, _c=chunk, _n=n_buf):
                def one(carry, _):
                    s = carry
                    for a, b in zip(w1ps, w2ps):
                        s = s + stream_probe(a, b, chunk=_c, n_buf=_n, mode=_m)
                    return s, ()
                return jax.lax.scan(
                    one, jnp.zeros((1, 128), jnp.float32), None, length=ITERS
                )[0].sum()

            try:
                t = bench(probe_chain, w1p, w2p)
                print(
                    f"probe {_pad(mode)} chunk={chunk:5d} n_buf={n_buf}: "
                    f"{t*1e3:7.2f} ms  {bytes_probe/t/1e9:6.0f} GB/s (int8 bytes)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"probe {mode} chunk={chunk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # same bytes DMA'd as int32 (no int8 tile packing in the DMA target)
    for chunk, n_buf in (() if skip_probes else ((1536, 4),)):
        w1p32 = [
            jnp.asarray(np.asarray(pack_w1(w.q, chunk)).view(np.int32))
            for w in w1s
        ]
        w2p32 = [
            jnp.asarray(np.asarray(pack_w2(w.q, chunk)).view(np.int32))
            for w in w2s
        ]

        @jax.jit
        def probe32_chain(w1ps, w2ps, _c=chunk, _n=n_buf):
            def one(carry, _):
                s = carry
                for a, b in zip(w1ps, w2ps):
                    s = s + stream_probe(a, b, chunk=_c, n_buf=_n, mode="dma")
                return s, ()
            return jax.lax.scan(
                one, jnp.zeros((1, 128), jnp.float32), None, length=ITERS
            )[0].sum()

        try:
            t = bench(probe32_chain, w1p32, w2p32)
            print(
                f"probe dma-as-i32 chunk={chunk:5d} n_buf={n_buf}: "
                f"{t*1e3:7.2f} ms  {bytes_probe/t/1e9:6.0f} GB/s (int8 bytes)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"probe dma-as-i32 chunk={chunk}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # ---- MLP-only ablation ring: which compute fails to hide under the
    # DMA? (q8 full / q8 no-gelu / q8 no-gelu-no-scale / bf16 same-code) ---
    h0 = jax.random.normal(ks[5], (B, C)).astype(dt)
    cases = [
        ("q8 full           ", jnp.int8, True, True),
        ("q8 no-gelu        ", jnp.int8, False, True),
        ("q8 no-gelu-noscale", jnp.int8, False, False),
        ("bf16 same-ring    ", dt, True, True),
    ]
    for name, wdt, use_gelu, use_scale in cases:
        chunk, n_buf = 1536, 4
        if wdt == jnp.int8:
            w1p = [pack_w1(w.q, chunk) for w in w1s]
            w2p = [pack_w2(w.q, chunk) for w in w2s]
            nb = n_buf
        else:
            w1p = [pack_w1((w.q.astype(dt) * w.scale.astype(dt)), chunk)
                   for w in w1s]
            w2p = [pack_w2((w.q.astype(dt) * w.scale.astype(dt)), chunk)
                   for w in w2s]
            nb = 2  # bf16 chunks are 2x bytes; keep VMEM bounded
        nbytes = bytes_probe * (2 if wdt != jnp.int8 else 1)

        @jax.jit
        def ab_chain(h, w1ps, w2ps, s1s, _g=use_gelu, _s=use_scale,
                     _c=chunk, _n=nb):
            def one(h, _):
                for a, b, s in zip(w1ps, w2ps, s1s):
                    h = ablate_ring(h, a, s, b, s[:C], chunk=_c, n_buf=_n,
                                    use_gelu=_g, use_scale=_s).astype(h.dtype)
                return h, ()
            return jax.lax.scan(one, h, None, length=ITERS)[0].sum()

        try:
            t = bench(ab_chain, h0, w1p, w2p, [w.scale for w in w1s])
            print(
                f"ablate {name} chunk={chunk} n_buf={nb}: {t*1e3:7.2f} ms  "
                f"{nbytes/t/1e9:6.0f} GB/s (weight bytes)", flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"ablate {name}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
