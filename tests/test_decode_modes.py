"""Equivalence tests for the decode-path performance variants.

The sampler ships multiple mathematically-identical formulations selected
for TPU performance (one-pass LayerNorm statistics; VPU vs MXU decode
attention, env knob RQVAE_TPU_DECODE_ATTN[_V]). These tests pin them to
each other so a perf experiment can never silently change the math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.models.rqtransformer import model as M


def test_layer_norm_one_pass_matches_two_pass():
    """model.py::layer_norm uses E[x^2]-mean^2 in fp32 (one fused reduce);
    must match the textbook two-pass form to fp32 precision."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (64, 37), jnp.float32) * 3.0 + 1.5
    scale = jax.random.normal(jax.random.PRNGKey(1), (37,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (37,)) * 0.1

    got = M.layer_norm(x, scale, bias)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    want = ((x32 - mean) * jax.lax.rsqrt(var + M.LN_EPS)) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("score_mode", ["vpu", "mxu"])
@pytest.mark.parametrize("v_mode", ["", "mxu"])
def test_decode_attention_modes_agree(score_mode, v_mode, monkeypatch):
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN", score_mode)
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN_V", v_mode)
    B, T, C, nh = 4, 9, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q, k, v = (jax.random.normal(ks[i], (B, 1, C)) for i in range(3))
    k_l, v_l = (jax.random.normal(ks[3 + i], (B, T, C)) for i in range(2))
    got = M._decode_attention_xla(q, k, v, k_l, v_l, jnp.int32(5), nh)

    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN", "vpu")
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN_V", "")
    ref = M._decode_attention_xla(q, k, v, k_l, v_l, jnp.int32(5), nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_decode_attention_matches_full_attention():
    """The cached S=1 decode attention must equal full causal attention at
    the corresponding position (any mode)."""
    B, T, C, nh = 3, 7, 32, 2
    cur = 4
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    xs = jax.random.normal(ks[0], (B, cur + 1, C))  # the full prefix
    # treat xs as q=k=v projections for simplicity
    mask = jnp.tril(jnp.ones((cur + 1, cur + 1), dtype=bool))
    full = M._attention(xs, xs, xs, nh, mask)[:, -1:, :]

    k_l = jnp.zeros((B, T, C)).at[:, :cur].set(xs[:, :cur])
    v_l = k_l
    new = xs[:, cur : cur + 1]
    got = M._decode_attention_xla(new, new, new, k_l, v_l, jnp.int32(cur), nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-5)


def test_auto_dispatch_policy(monkeypatch):
    """Pin the measured auto policy (COVERAGE.md round-2 perf notes): one
    custom-call family per operating point — dense pallas < 150, pure XLA
    150-300, attention pallas >= 300. On non-TPU backends everything
    falls back to XLA."""
    monkeypatch.delenv("RQVAE_TPU_DECODE_ATTN", raising=False)
    monkeypatch.delenv("RQVAE_TPU_DECODE_DENSE", raising=False)
    C, nh, dt = 1536, 24, jnp.bfloat16

    # CPU (tests force it): all kernels off in auto
    assert not M._use_pallas_decode_attn(64, C, nh, dt, batch=500)
    assert not M._use_pallas_decode_dense(C, dt, batch=100)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for batch, want_attn, want_dense in [
        (100, False, True), (200, False, False), (500, True, False),
    ]:
        assert M._use_pallas_decode_attn(64, C, nh, dt, batch=batch) == want_attn
        assert M._use_pallas_decode_dense(C, dt, batch=batch) == want_dense
    # tiny head caches never take the attention kernel
    assert not M._use_pallas_decode_attn(4, C, nh, dt, batch=500)
    # forced modes override
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN", "pallas")
    assert M._use_pallas_decode_attn(64, C, nh, dt, batch=100)
    monkeypatch.setenv("RQVAE_TPU_DECODE_DENSE", "xla")
    assert not M._use_pallas_decode_dense(C, dt, batch=100)
