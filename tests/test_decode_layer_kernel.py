"""Dense decode-layer Pallas kernels (interpret mode on CPU).

fused_ln_qkv / fused_proj_mlp (ops/decode_layer_kernel.py) must match the
XLA composition in model.stack_step_unrolled to fp32 precision (fp32
inputs) / a couple of bf16 ulps (bf16 inputs, where XLA's own fusion
rounding differs too).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.ops import decode_layer_kernel as DL

B, C, H = 12, 256, 1024


def _mk(dt):
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    p = dict(
        x=jax.random.normal(ks[0], (B, C), jnp.float32).astype(dt),
        y=jax.random.normal(ks[1], (B, C), jnp.float32).astype(dt),
        lns=jax.random.normal(ks[2], (C,)) * 0.1 + 1.0,
        lnb=jax.random.normal(ks[3], (C,)) * 0.1,
        wqkv=(jax.random.normal(ks[4], (C, 3 * C), jnp.float32) * 0.05).astype(dt),
        bqkv=(jax.random.normal(ks[5], (3 * C,), jnp.float32) * 0.05).astype(dt),
        wo=(jax.random.normal(ks[6], (C, C), jnp.float32) * 0.05).astype(dt),
        bo=jnp.zeros((C,), dt),
        w1=(jax.random.normal(ks[7], (C, H), jnp.float32) * 0.05).astype(dt),
        b1=(jax.random.normal(ks[8], (H,), jnp.float32) * 0.05).astype(dt),
        w2=(jax.random.normal(ks[9], (H, C), jnp.float32) * 0.05).astype(dt),
        b2=jnp.zeros((C,), dt),
    )
    return p


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 0.1)])
def test_fused_ln_qkv_matches_xla(dt, tol):
    p = _mk(dt)
    h = M.layer_norm(p["x"], p["lns"], p["lnb"])
    ref = h @ p["wqkv"] + p["bqkv"]
    got = DL.fused_ln_qkv(
        p["x"], p["lns"], p["lnb"], p["wqkv"], p["bqkv"], chunk=256,
        interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 0.1)])
@pytest.mark.parametrize("gelu_version", ["v1", "v2"])
def test_fused_proj_mlp_matches_xla(dt, tol, gelu_version):
    p = _mk(dt)
    x2 = p["x"] + (p["y"] @ p["wo"] + p["bo"])
    h2 = M.layer_norm(x2, p["lns"], p["lnb"])
    ref = x2 + (
        M.gelu(h2 @ p["w1"] + p["b1"], gelu_version) @ p["w2"] + p["b2"]
    )
    got = DL.fused_proj_mlp(
        p["x"], p["y"], p["wo"], p["bo"], p["lns"], p["lnb"],
        p["w1"], p["b1"], p["w2"], p["b2"],
        gelu_version=gelu_version, chunk=256, interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-4), (jnp.bfloat16, 0.1)])
def test_fused_ln_qkv_q8_matches_xla(dt, tol):
    """int8 streaming kernel == the XLA QuantizedWeight path
    ((h @ q.astype) * scale + b) within fusion-rounding tolerance."""
    p = _mk(dt)
    wq = M._quantize_weight(p["wqkv"])
    h = M.layer_norm(p["x"], p["lns"], p["lnb"])
    ref = (h @ wq.q.astype(dt)) * wq.scale.astype(dt) + p["bqkv"]
    got = DL.fused_ln_qkv_q8(
        p["x"], p["lns"], p["lnb"], wq.q, wq.scale, p["bqkv"],
        chunk=256, interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-4), (jnp.bfloat16, 0.1)])
@pytest.mark.parametrize("n_buf", [2, 3])
def test_fused_ln_qkv_q8_ring_matches_xla(dt, tol, n_buf):
    """The DMA-ring q8 QKV kernel == XLA, and bit-identical to the grid
    q8 QKV kernel in interpret mode (same op order)."""
    p = _mk(dt)
    wq = M._quantize_weight(p["wqkv"])
    h = M.layer_norm(p["x"], p["lns"], p["lnb"])
    ref = (h @ wq.q.astype(dt)) * wq.scale.astype(dt) + p["bqkv"]
    got = DL.fused_ln_qkv_q8_ring(
        p["x"], p["lns"], p["lnb"], wq.q, wq.scale, p["bqkv"],
        chunk=256, n_buf=n_buf, interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err
    grid = DL.fused_ln_qkv_q8(
        p["x"], p["lns"], p["lnb"], wq.q, wq.scale, p["bqkv"],
        chunk=256, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(grid, np.float32)
    )


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-4), (jnp.bfloat16, 0.1)])
@pytest.mark.parametrize("gelu_version", ["v1", "v2"])
def test_fused_proj_mlp_q8_matches_xla(dt, tol, gelu_version):
    p = _mk(dt)
    wo, w1, w2 = (M._quantize_weight(p[n]) for n in ("wo", "w1", "w2"))
    x2 = p["x"] + ((p["y"] @ wo.q.astype(dt)) * wo.scale.astype(dt) + p["bo"])
    h2 = M.layer_norm(x2, p["lns"], p["lnb"])
    t = M.gelu((h2 @ w1.q.astype(dt)) * w1.scale.astype(dt) + p["b1"], gelu_version)
    ref = x2 + ((t @ w2.q.astype(dt)) * w2.scale.astype(dt) + p["b2"])
    got = DL.fused_proj_mlp_q8(
        p["x"], p["y"], wo.q, wo.scale, p["bo"], p["lns"], p["lnb"],
        w1.q, w1.scale, p["b1"], w2.q, w2.scale, p["b2"],
        gelu_version=gelu_version, chunk=256, interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err


@pytest.mark.parametrize("dt,tol", [(jnp.float32, 2e-4), (jnp.bfloat16, 0.1)])
@pytest.mark.parametrize("n_buf", [2, 3])
def test_fused_proj_mlp_q8_ring_matches_xla(dt, tol, n_buf):
    """The DMA-ring q8 kernel (the shipped int8 dense path) == XLA; also
    bit-identical to the grid-pipeline kernel in interpret mode (same op
    order; on real TPU Mosaic contraction differs by <=2 bf16 ulps)."""
    p = _mk(dt)
    wo, w1, w2 = (M._quantize_weight(p[n]) for n in ("wo", "w1", "w2"))
    x2 = p["x"] + ((p["y"] @ wo.q.astype(dt)) * wo.scale.astype(dt) + p["bo"])
    h2 = M.layer_norm(x2, p["lns"], p["lnb"])
    t = M.gelu((h2 @ w1.q.astype(dt)) * w1.scale.astype(dt) + p["b1"], "v1")
    ref = x2 + ((t @ w2.q.astype(dt)) * w2.scale.astype(dt) + p["b2"])
    got = DL.fused_proj_mlp_q8_ring(
        p["x"], p["y"], wo.q, wo.scale, p["bo"], p["lns"], p["lnb"],
        w1.q, w1.scale, p["b1"], w2.q, w2.scale, p["b2"],
        chunk=256, n_buf=n_buf, interpret=True,
    )
    err = np.abs(
        np.asarray(ref, np.float32) - np.asarray(got, np.float32)
    ).max()
    assert err < tol, err
    grid = DL.fused_proj_mlp_q8(
        p["x"], p["y"], wo.q, wo.scale, p["bo"], p["lns"], p["lnb"],
        w1.q, w1.scale, p["b1"], w2.q, w2.scale, p["b2"],
        chunk=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(grid, np.float32))


def test_stack_step_unrolled_q8_dense_mode_matches_xla(monkeypatch):
    """Full decode step with int8-quantized params through the q8 dense
    kernels (interpret on CPU) == the XLA QuantizedWeight path."""
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
    qbody = M.quantize_stack_params(params["body"])
    lps = M.split_layer_params(qbody, config.body)
    Bt, T = 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (Bt, 1, 128))
    caches = M.init_unrolled_kv_cache(config.body, Bt, T)
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

    monkeypatch.setattr(
        M, "resolve_dense_backend", lambda mode, **kw: "pallas"
    )
    monkeypatch.setattr(DL.pl, "pallas_call", force_interpret)
    got_x, got_caches = M.stack_step_unrolled(
        lps, x, caches, cur, config.body,
        policy=M.DecodePolicy(dense="pallas"),
    )
    np.testing.assert_allclose(
        np.asarray(got_x), np.asarray(ref_x), rtol=1e-4, atol=1e-4
    )
    for (gk, gv), (rk, rv) in zip(got_caches, ref_caches):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(rv), rtol=1e-4, atol=1e-5
        )


def test_chunk_picker_covers_odd_hiddens():
    # C=1280 geometries: H=5120, 3C=3840 — must pick a lane-aligned divisor
    assert DL._pick_chunk(5120) == 1280
    assert DL._pick_chunk(3840) == 1280
    assert DL._pick_chunk(6144) == 1536
    assert DL._pick_chunk(128) == 128


def test_stack_step_unrolled_dense_mode_matches_xla(monkeypatch):
    """Full decode step through the dense-kernel dispatch (interpret via
    CPU-forced pallas) == the XLA path, including cache updates."""
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
    Bt, T = 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (Bt, 1, 128))
    caches = M.init_unrolled_kv_cache(config.body, Bt, T)
    caches = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape), caches
    )
    cur = jnp.int32(3)

    ref_x, ref_caches = M.stack_step_unrolled(lps, x, caches, cur, config.body)

    # interpret-mode pallas on CPU: force the dense path via the policy and
    # patch pallas_call to interpret (resolve_dense_backend requires TPU)
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def force_interpret(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    monkeypatch.setattr(
        M, "resolve_dense_backend", lambda mode, **kw: "pallas"
    )
    monkeypatch.setattr(DL.pl, "pallas_call", force_interpret)
    got_x, got_caches = M.stack_step_unrolled(
        lps, x, caches, cur, config.body,
        policy=M.DecodePolicy(dense="pallas"),
    )

    np.testing.assert_allclose(
        np.asarray(got_x), np.asarray(ref_x), rtol=1e-5, atol=1e-5
    )
    # k/v rows come off the chunked qkv matmul — fp accumulation order
    # differs from the monolithic XLA dot, so allclose not array_equal
    for (gk, gv), (rk, rv) in zip(got_caches, ref_caches):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(rk), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-6
        )
