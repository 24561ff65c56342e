"""Fused decode-layer megakernel (interpret mode on CPU) vs the XLA layer
composition used by model.stack_step_unrolled."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import decode_megakernel as MK

B, C, NH = 6, 256, 4
H = 4 * C
T = 32


def _mk(dt, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 16)
    r = lambda i, shape, s=0.05: (
        jax.random.normal(ks[i], shape, jnp.float32) * s
    ).astype(dt)
    return dict(
        x=r(0, (B, C), 1.0),
        k_cache=r(1, (B, T, C), 1.0),
        v_cache=r(2, (B, T, C), 1.0),
        lns1=jax.random.normal(ks[3], (C,)) * 0.1 + 1.0,
        lnb1=jax.random.normal(ks[4], (C,)) * 0.1,
        wqkv=r(5, (C, 3 * C)),
        bqkv=r(6, (3 * C,)),
        wo=r(7, (C, C)),
        bo=r(8, (C,)),
        lns2=jax.random.normal(ks[9], (C,)) * 0.1 + 1.0,
        lnb2=jax.random.normal(ks[10], (C,)) * 0.1,
        w1=r(11, (C, H)),
        b1=r(12, (H,)),
        w2=r(13, (H, C)),
        b2=r(14, (C,)),
    )


def _ref(p, cur, gelu_version="v1"):
    h = M.layer_norm(p["x"], p["lns1"], p["lnb1"])
    qkv = h @ p["wqkv"] + p["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    y = M._decode_attention_xla(
        q[:, None], k[:, None], v[:, None], p["k_cache"], p["v_cache"],
        cur, NH, mode="vpu",
    )[:, 0]
    x2 = p["x"] + (y.astype(p["x"].dtype) @ p["wo"] + p["bo"])
    h2 = M.layer_norm(x2, p["lns2"], p["lnb2"])
    out = x2 + (M.gelu(h2 @ p["w1"] + p["b1"], gelu_version) @ p["w2"] + p["b2"])
    return out, k, v


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 5e-5), (jnp.bfloat16, 0.15)])
@pytest.mark.parametrize("cur", [0, 5, T - 1])
def test_megakernel_matches_xla_layer(dt, tol, cur):
    p = _mk(dt)
    cur_len = jnp.int32(cur)
    ref_out, ref_k, ref_v = _ref(p, cur_len)
    got_out, got_k, got_v = MK.decode_layer_step(
        p["x"], p["k_cache"], p["v_cache"], cur_len,
        p["lns1"], p["lnb1"], p["wqkv"], p["bqkv"],
        p["wo"], p["bo"], p["lns2"], p["lnb2"],
        p["w1"], p["b1"], p["w2"], p["b2"],
        n_head=NH, t_chunk=8, m_chunk=256, interpret=True,
    )
    for got, ref in [(got_out, ref_out), (got_k, ref_k), (got_v, ref_v)]:
        err = np.abs(
            np.asarray(got, np.float32) - np.asarray(ref, np.float32)
        ).max()
        assert err < tol, err


def test_stack_step_unrolled_mega_mode_matches_xla(monkeypatch):
    """policy.dense='mega' routes the whole layer through the fused kernel
    (interpret on CPU) and must match the XLA path incl. cache updates."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[4, 4, 2],
        embed_dim=128, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 4}},
        head={"n_layer": 1, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    lps = M.split_layer_params(params["body"], config.body)
    Bt, Tc = 6, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (Bt, 1, 128))
    caches = M.init_unrolled_kv_cache(config.body, Bt, Tc)
    caches = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape), caches
    )
    cur = jnp.int32(3)

    ref_x, ref_caches = M.stack_step_unrolled(lps, x, caches, cur, config.body)

    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def force_interpret(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    monkeypatch.setattr(M, "resolve_dense_backend", lambda mode, **kw: "mega")
    monkeypatch.setattr(MK.pl, "pallas_call", force_interpret)
    got_x, got_caches = M.stack_step_unrolled(
        lps, x, caches, cur, config.body,
        policy=M.DecodePolicy(dense="mega"),
    )
    np.testing.assert_allclose(
        np.asarray(got_x), np.asarray(ref_x), rtol=1e-4, atol=1e-5
    )
    for (gk, gv), (rk, rv) in zip(got_caches, ref_caches):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(rv), rtol=1e-4, atol=1e-6
        )


def test_megakernel_window_prefix():
    """A static window smaller than the cache must read only the prefix."""
    dt = jnp.float32
    p = _mk(dt)
    cur_len = jnp.int32(7)
    Wn = 16
    p2 = dict(p)
    # garbage beyond the window must not affect the result
    p2["k_cache"] = p["k_cache"].at[:, Wn:].set(1e6)
    p2["v_cache"] = p["v_cache"].at[:, Wn:].set(1e6)
    ref_out, _, _ = _ref(
        {**p, "k_cache": p["k_cache"][:, :Wn], "v_cache": p["v_cache"][:, :Wn]},
        cur_len,
    )
    got_out, _, _ = MK.decode_layer_step(
        p2["x"], p2["k_cache"], p2["v_cache"], cur_len,
        p2["lns1"], p2["lnb1"], p2["wqkv"], p2["bqkv"],
        p2["wo"], p2["bo"], p2["lns2"], p2["lnb2"],
        p2["w1"], p2["b1"], p2["w2"], p2["b2"],
        n_head=NH, t_window=Wn, t_chunk=8, m_chunk=256, interpret=True,
    )
    err = np.abs(np.asarray(got_out) - np.asarray(ref_out)).max()
    assert err < 5e-5, err
