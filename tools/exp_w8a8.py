"""W8A8 decode-MLP kernel experiment: int8 x int8 -> int32 on the MXU.

The shipped q8 kernels (ops/decode_layer_kernel.py::*_q8) stream int8
weights (half the DMA bytes) but DEQUANTIZE each chunk on the VPU into the
MXU feed; the int8 trace shows proj_mlp_q8 at ~212 ms/iter vs ~161 for
perfect byte-scaling of the bf16 kernel's 310. Hypothesis: the per-chunk
int8->bf16 convert (C x chunk VPU elements) serializes against the MXU
dot in Mosaic's pipeline. A true W8A8 path quantizes the SMALL activation
block per row (B x C VPU work, 15x smaller than the weight chunk), feeds
the MXU s8 x s8 -> s32 (2x MXU rate on v5e), and applies
row-scale x col-scale on the int32 accumulator.

This measures an HBM-resident 16-layer dependent chain of decode-shaped
proj+MLP steps (same harness as tools/exp_q8_chunk.py):
  bf16 kernel | q8 (dequant) kernel | q8a8 kernel
plus the q8a8 vs q8 numeric error on unit-scale activations.

Run: python tools/exp_w8a8.py [bs]
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


def _quant_rows(x):
    """Per-row symmetric int8: returns (q int8, scale fp32 [B, 1])."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _proj_mlp_q8a8_kernel(
    x_ref, y_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, b2_ref, o_ref,
    x2_s, hq_s, hs_s, acc_s,
    *, gelu_version: str,
):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    cd = x_ref.dtype

    @pl.when(i == 0)
    def _():
        # wo stays dequant-on-VPU: it is block-resident (loaded once), so
        # its convert is off the per-chunk critical path
        proj = jnp.dot(
            y_ref[:], wo_ref[:].astype(cd),
            preferred_element_type=jnp.float32,
        ) * wos_ref[:].astype(jnp.float32)
        x2 = x_ref[:] + (proj + bo_ref[:].astype(jnp.float32)).astype(cd)
        x2_s[:] = x2
        h = DL._ln(x2, lns_ref[:], lnb_ref[:], jnp.float32)
        s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        hq_s[:] = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
        hs_s[:] = s
        acc_s[:] = jnp.zeros_like(acc_s)

    # s8 x s8 -> s32 MXU; (row scale x col scale) on the int32 accumulator
    t32 = jax.lax.dot_general(
        hq_s[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    t = (
        t32.astype(jnp.float32) * hs_s[:] * w1s_ref[:].astype(jnp.float32)
        + b1_ref[:].astype(jnp.float32)
    )
    t = DL._gelu(t, gelu_version)
    ts = jnp.max(jnp.abs(t), axis=-1, keepdims=True) / 127.0
    ts = jnp.maximum(ts, 1e-8)
    tq = jnp.clip(jnp.round(t / ts), -127, 127).astype(jnp.int8)
    m32 = jax.lax.dot_general(
        tq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_s[:] += m32.astype(jnp.float32) * ts

    @pl.when(i == nc - 1)
    def _():
        m = (
            acc_s[:] * w2s_ref[:].astype(jnp.float32)
            + b2_ref[:].astype(jnp.float32)
        ).astype(cd)
        o_ref[:] = x2_s[:] + m


@functools.partial(jax.jit, static_argnames=("gelu_version", "chunk"))
def fused_proj_mlp_q8a8(
    x, y, wo_q, wo_scale, bo, ln_scale, ln_bias,
    w1_q, w1_scale, b1, w2_q, w2_scale, b2,
    gelu_version="v1", chunk=1536,
):
    Bx, Cx = x.shape
    Hx = w1_q.shape[1]
    kern = functools.partial(_proj_mlp_q8a8_kernel, gelu_version=gelu_version)
    return pl.pallas_call(
        kern,
        grid=(Hx // chunk,),
        in_specs=[
            pl.BlockSpec((Bx, Cx), lambda i: (0, 0)),
            pl.BlockSpec((Bx, Cx), lambda i: (0, 0)),
            pl.BlockSpec((Cx, Cx), lambda i: (0, 0)),
            pl.BlockSpec((1, Cx), lambda i: (0, 0)),
            pl.BlockSpec((Cx,), lambda i: (0,)),
            pl.BlockSpec((Cx,), lambda i: (0,)),
            pl.BlockSpec((Cx,), lambda i: (0,)),
            pl.BlockSpec((Cx, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
            pl.BlockSpec((1, chunk), lambda i: (0, i)),
            pl.BlockSpec((chunk, Cx), lambda i: (i, 0)),
            pl.BlockSpec((1, Cx), lambda i: (0, 0)),
            pl.BlockSpec((1, Cx), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Bx, Cx), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bx, Cx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bx, Cx), x.dtype),
            pltpu.VMEM((Bx, Cx), jnp.int8),
            pltpu.VMEM((Bx, 1), jnp.float32),
            pltpu.VMEM((Bx, Cx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        x, y, wo_q, wo_scale.reshape(1, Cx), bo, ln_scale, ln_bias,
        w1_q, w1_scale.reshape(1, Hx), b1.reshape(1, Hx),
        w2_q, w2_scale.reshape(1, Cx), b2.reshape(1, Cx),
    )


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, C)).astype(dt)
    y = jax.random.normal(ks[1], (B, C)).astype(dt)
    lns = jnp.ones((C,))
    lnb = jnp.zeros((C,))
    bo = jnp.zeros((C,), dt)
    b1 = jnp.zeros((H,), dt)
    b2 = jnp.zeros((C,), dt)

    # weights as jit ARGS (HLO-constant embedding would upload via the
    # tunnel: HTTP 413; CLAUDE.md)
    wos = [M._quantize_weight(jax.random.normal(k, (C, C)) * 0.05)
           for k in jax.random.split(ks[2], L)]
    w1s = [M._quantize_weight(jax.random.normal(k, (C, H)) * 0.05)
           for k in jax.random.split(ks[3], L)]
    w2s = [M._quantize_weight(jax.random.normal(k, (H, C)) * 0.05)
           for k in jax.random.split(ks[4], L)]
    wobf = [w.q.astype(dt) * w.scale.astype(dt) for w in wos]
    w1bf = [w.q.astype(dt) * w.scale.astype(dt) for w in w1s]
    w2bf = [w.q.astype(dt) * w.scale.astype(dt) for w in w2s]

    ITERS = int(os.environ.get("EXP_ITERS", "30"))

    def bench(fn, *args):
        # scan the 16-layer chain ITERS times inside ONE jit: per-dispatch
        # tunnel latency (~10 ms) otherwise swamps the ~1.3 ms chain
        np.asarray(fn(*args))  # compile
        t0 = time.time()
        out = fn(*args)
        np.asarray(out)
        return (time.time() - t0) / ITERS

    @jax.jit
    def chain_bf16(x, y, ws):
        def one(x, _):
            for wo, w1, w2 in zip(*ws):
                x = DL.fused_proj_mlp(x, y, wo, bo, lns, lnb, w1, b1, w2, b2)
            return x, ()
        return jax.lax.scan(one, x, None, length=ITERS)[0].sum()

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

    @jax.jit
    def chain_q8a8(x, y, wos, w1s, w2s):
        def one(x, _):
            for wo, w1, w2 in zip(wos, w1s, w2s):
                x = fused_proj_mlp_q8a8(
                    x, y, wo.q, wo.scale, bo, lns, lnb,
                    w1.q, w1.scale, b1, w2.q, w2.scale, b2,
                )
            return x, ()
        return jax.lax.scan(one, x, None, length=ITERS)[0].sum()

    t_bf = bench(chain_bf16, x, y, (wobf, w1bf, w2bf))
    bytes_bf = L * (C * C + 2 * C * H) * 2
    print(f"bf16  chain: {t_bf*1e3:7.2f} ms  {bytes_bf/t_bf/1e9:6.0f} GB/s", flush=True)

    t_q8 = bench(chain_q8, x, y, wos, w1s, w2s)
    bytes_q8 = L * (C * C + 2 * C * H)
    print(f"q8    chain: {t_q8*1e3:7.2f} ms  {bytes_q8/t_q8/1e9:6.0f} GB/s (int8 bytes)", flush=True)

    t_a8 = bench(chain_q8a8, x, y, wos, w1s, w2s)
    print(f"q8a8  chain: {t_a8*1e3:7.2f} ms  {bytes_q8/t_a8/1e9:6.0f} GB/s (int8 bytes)", flush=True)

    # numeric error of ONE q8a8 layer vs the q8 (W8A16) layer
    o_q8 = DL.fused_proj_mlp_q8(
        x, y, wos[0].q, wos[0].scale, bo, lns, lnb,
        w1s[0].q, w1s[0].scale, b1, w2s[0].q, w2s[0].scale, b2,
    )
    o_a8 = fused_proj_mlp_q8a8(
        x, y, wos[0].q, wos[0].scale, bo, lns, lnb,
        w1s[0].q, w1s[0].scale, b1, w2s[0].q, w2s[0].scale, b2,
    )
    d = np.abs(np.asarray(o_a8, np.float32) - np.asarray(o_q8, np.float32))
    r = np.abs(np.asarray(o_q8, np.float32)).mean()
    print(f"q8a8 vs q8: mean|d| {d.mean():.5f} max|d| {d.max():.5f} (mean|q8| {r:.4f})", flush=True)


if __name__ == "__main__":
    main()
