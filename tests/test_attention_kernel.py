"""Pallas decode-attention kernels (interpret mode on CPU).

Status: SHIPPED (r2) — decode_attention is the default body decode
attention on TPU for cache windows >= 32 (model.resolve_attn_backend).
The r1 "parked" verdict came from benchmarking through jnp.pad of the
ragged batch, which copied the whole KV cache per call; the pad-free
kernel streams at ~740 GB/s vs ~600 for the XLA formulations
(tools/exp_pallas_attn.py). These tests pin the kernel's math on CPU;
on-chip parity is covered by the sampler equivalence + bench runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.ops.attention_kernel import (
    decode_attention_update,
    decode_attention,
    decode_attention_q8,
    decode_attention_stacked,
    dequantize_cache,
    quantize_kv,
)

B, T, C, NH, HS = 8, 17, 256, 4, 64


def reference_attention(q, kn, vn, kc, vc, cur):
    qf, knf, vnf = (np.asarray(a, np.float32) for a in (q, kn, vn))
    kcf, vcf = (np.asarray(a, np.float32) for a in (kc, vc))
    scale = 1.0 / np.sqrt(HS)
    s_past = (kcf * qf[:, None, :]).reshape(B, T, NH, HS).sum(-1) * scale
    s_past[:, cur:, :] = -np.inf
    s_self = (knf * qf).reshape(B, NH, HS).sum(-1)[:, None, :] * scale
    s = np.concatenate([s_past, s_self], 1)
    e = np.exp(s - s.max(1, keepdims=True))
    w = e / e.sum(1, keepdims=True)
    v_all = np.concatenate([vcf.reshape(B, T, NH, HS), vnf.reshape(B, 1, NH, HS)], 1)
    return (v_all * w[..., None]).sum(1).reshape(B, C)


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 0.05)])
def test_decode_attention_matches_reference(dt, tol):
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, C), dt)
    kn = jnp.asarray(r.randn(B, C), dt)
    vn = jnp.asarray(r.randn(B, C), dt)
    kc = jnp.asarray(r.randn(B, T, C), dt)
    vc = jnp.asarray(r.randn(B, T, C), dt)
    y = np.asarray(
        decode_attention(q, kn, vn, kc, vc, jnp.int32(9), NH, interpret=True),
        np.float32,
    )
    yref = reference_attention(q, kn, vn, kc, vc, 9)
    assert np.abs(y - yref).max() < tol


def test_decode_attention_t_window_prefix_and_ragged_batch():
    """t_window reads only the cache prefix (rows >= cur_len masked) and a
    batch not divisible by b_tile is handled by boundary-block masking."""
    r = np.random.RandomState(2)
    Br = 13  # ragged vs b_tile=8
    q = jnp.asarray(r.randn(Br, C).astype(np.float32))
    kn = jnp.asarray(r.randn(Br, C).astype(np.float32))
    vn = jnp.asarray(r.randn(Br, C).astype(np.float32))
    kc = jnp.asarray(r.randn(Br, T, C).astype(np.float32))
    vc = jnp.asarray(r.randn(Br, T, C).astype(np.float32))
    cur = 7
    got = decode_attention(
        q, kn, vn, kc, vc, jnp.int32(cur), NH, t_window=9, interpret=True
    )
    # garbage beyond the window must not leak: full-cache call, same cur_len
    want = decode_attention(
        q, kn, vn, kc, vc, jnp.int32(cur), NH, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_quantize_kv_round_trip():
    """Per-(row, head) absmax int8: q * scale reconstructs within 1/127 of
    each head's absmax."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(B, C).astype(np.float32)) * 3.0
    q8, s = quantize_kv(x, NH)
    assert q8.dtype == jnp.int8 and s.shape == (B, NH)
    xh = np.asarray(x).reshape(B, NH, HS)
    rec = np.asarray(q8, np.float32).reshape(B, NH, HS) * np.asarray(s)[..., None]
    amax = np.abs(xh).max(-1, keepdims=True)
    assert np.abs(rec - xh).max() <= (amax / 127.0 * 0.51 + 1e-6).max()


def test_decode_attention_q8_matches_dequantized_reference():
    """The q8 kernel must equal attention over the DEQUANTIZED cache (the
    quantization error itself is the accepted approximation; the kernel's
    scale-folding must add nothing beyond bf16 rounding)."""
    r = np.random.RandomState(4)
    q = jnp.asarray(r.randn(B, C), jnp.bfloat16)
    kn = jnp.asarray(r.randn(B, C), jnp.bfloat16)
    vn = jnp.asarray(r.randn(B, C), jnp.bfloat16)
    kc = jnp.asarray(r.randn(B, T, C).astype(np.float32))
    vc = jnp.asarray(r.randn(B, T, C).astype(np.float32))
    kq, ks = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(kc, NH)
    vq, vs = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(vc, NH)
    y = np.asarray(
        decode_attention_q8(
            q, kn, vn, kq, ks, vq, vs, jnp.int32(9), NH, interpret=True
        ),
        np.float32,
    )
    kc_dq = dequantize_cache(kq, ks, NH)
    vc_dq = dequantize_cache(vq, vs, NH)
    yref = reference_attention(q, kn, vn, kc_dq, vc_dq, 9)
    assert np.abs(y - yref).max() < 0.05
    # and the full pipeline (quant + kernel) tracks the exact fp32 result
    yexact = reference_attention(q, kn, vn, kc, vc, 9)
    assert np.abs(y - yexact).max() < 0.08


def test_stacked_variant_selects_layer_without_copy_semantics():
    L = 3
    r = np.random.RandomState(1)
    q = jnp.asarray(r.randn(B, C).astype(np.float32))
    kn = jnp.asarray(r.randn(B, C).astype(np.float32))
    vn = jnp.asarray(r.randn(B, C).astype(np.float32))
    kc = jnp.asarray(r.randn(L, B, T, C).astype(np.float32))
    vc = jnp.asarray(r.randn(L, B, T, C).astype(np.float32))
    for l in range(L):
        y1 = decode_attention(q, kn, vn, kc[l], vc[l], jnp.int32(9), NH, interpret=True)
        y2 = decode_attention_stacked(
            q, kn, vn, kc, vc, jnp.int32(l), jnp.int32(9), NH, b_tile=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_decode_attention_update_matches_separate_write():
    """decode_attention_update must (a) return the same y as the plain
    kernel and (b) leave the caches equal to an explicit
    dynamic_update_slice at row cur_len — including the ragged last batch
    tile and a t_window < T."""
    r = np.random.RandomState(7)
    Br = 12  # ragged: 12 = 8 + 4 with b_tile=8
    q = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    kn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    vn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    Tc = 32  # sublane-aligned cache
    kc = jnp.asarray(r.randn(Br, Tc, C), jnp.bfloat16)
    vc = jnp.asarray(r.randn(Br, Tc, C), jnp.bfloat16)
    for cur, win in [(9, 16), (17, 32), (31, 32)]:
        cur_len = jnp.int32(cur)
        y0 = decode_attention(
            q, kn, vn, kc, vc, cur_len, NH, t_window=win, interpret=True
        )
        y, k2, v2 = decode_attention_update(
            q, kn, vn, kc, vc, cur_len, NH, t_window=win, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y))
        kref = jax.lax.dynamic_update_slice(kc, kn[:, None, :], (0, cur, 0))
        vref = jax.lax.dynamic_update_slice(vc, vn[:, None, :], (0, cur, 0))
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(kref))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vref))


def test_decode_attention_q8_update_matches_separate_path():
    """The q8 fused-write kernel must return the same y as decode_attention_q8
    and leave all four caches bit-equal to the XLA quantize_kv +
    dynamic_update_slice path (same fp32 absmax/round math in-kernel)."""
    from rqvae_tpu.ops.attention_kernel import decode_attention_q8_update

    r = np.random.RandomState(11)
    Br, Tc = 12, 32
    q = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    kn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    vn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    kc = jnp.asarray(r.randn(Br, Tc, C).astype(np.float32))
    vc = jnp.asarray(r.randn(Br, Tc, C).astype(np.float32))
    kq, ks = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(kc, NH)
    vq, vs = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(vc, NH)
    ks, vs = ks.astype(jnp.bfloat16), vs.astype(jnp.bfloat16)
    for cur in (9, 31):
        cur_len = jnp.int32(cur)
        y0 = decode_attention_q8(
            q, kn, vn, kq, ks, vq, vs, cur_len, NH, interpret=True
        )
        y, kq2, ks2, vq2, vs2 = decode_attention_q8_update(
            q, kn, vn, kq, ks, vq, vs, cur_len, NH, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y))
        kqn, ksn = quantize_kv(kn, NH)
        vqn, vsn = quantize_kv(vn, NH)
        def upd(c, new):
            return jax.lax.dynamic_update_slice(
                c, new[:, None].astype(c.dtype), (0, cur, 0)
            )
        np.testing.assert_array_equal(np.asarray(kq2), np.asarray(upd(kq, kqn)))
        np.testing.assert_array_equal(np.asarray(ks2), np.asarray(upd(ks, ksn)))
        np.testing.assert_array_equal(np.asarray(vq2), np.asarray(upd(vq, vqn)))
        np.testing.assert_array_equal(np.asarray(vs2), np.asarray(upd(vs, vsn)))


def test_decode_attention_q8_update_wo_matches_separate_path():
    """The wo-folded kernel (attention + output projection + residual + LN2
    in one custom call, DecodePolicy.attn_wo) must match the composition of
    decode_attention_q8_update and the XLA-side
    x2 = x + (y @ wo_q)*scale + bo; h2 = LN2(x2) within bf16 rounding, and
    leave all four caches bit-equal."""
    from rqvae_tpu.models.rqtransformer import model as M
    from rqvae_tpu.ops.attention_kernel import (
        decode_attention_q8_update,
        decode_attention_q8_update_wo,
    )

    r = np.random.RandomState(13)
    Br, Tc = 12, 32
    q = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    kn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    vn = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    x = jnp.asarray(r.randn(Br, C), jnp.bfloat16)
    kc = jnp.asarray(r.randn(Br, Tc, C).astype(np.float32))
    vc = jnp.asarray(r.randn(Br, Tc, C).astype(np.float32))
    kq, ks = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(kc, NH)
    vq, vs = jax.vmap(quantize_kv, in_axes=(1, None), out_axes=1)(vc, NH)
    ks, vs = ks.astype(jnp.bfloat16), vs.astype(jnp.bfloat16)
    wo = M._quantize_weight(jnp.asarray(r.randn(C, C).astype(np.float32) * 0.05))
    bo = jnp.asarray(r.randn(C).astype(np.float32) * 0.01)
    lns = jnp.asarray(1.0 + 0.1 * r.randn(C).astype(np.float32))
    lnb = jnp.asarray(0.1 * r.randn(C).astype(np.float32))

    for cur in (9, 31):
        cur_len = jnp.int32(cur)
        y, kq2, ks2, vq2, vs2 = decode_attention_q8_update(
            q, kn, vn, kq, ks, vq, vs, cur_len, NH, interpret=True
        )
        cd = jnp.bfloat16
        proj = (y.astype(cd) @ wo.q.astype(cd)).astype(jnp.float32) * wo.scale
        x2_ref = x + (proj + bo).astype(cd)
        h2_ref = M.layer_norm(x2_ref, lns, lnb)

        x2, h2, kq3, ks3, vq3, vs3 = decode_attention_q8_update_wo(
            q, kn, vn, kq, ks, vq, vs, cur_len,
            x, wo.q, wo.scale, bo, lns, lnb, NH, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(x2, np.float32), np.asarray(x2_ref, np.float32),
            rtol=0, atol=0.06,
        )
        np.testing.assert_allclose(
            np.asarray(h2, np.float32), np.asarray(h2_ref, np.float32),
            rtol=0, atol=0.06,
        )
        for a, b in ((kq2, kq3), (ks2, ks3), (vq2, vq3), (vs2, vs3)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
