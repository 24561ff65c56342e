"""Equivalence + policy tests for the decode-path performance variants.

The sampler ships multiple mathematically-identical formulations selected
for TPU performance (one-pass LayerNorm statistics; VPU vs MXU vs Pallas
decode attention; XLA vs Pallas dense kernels). All selection state lives
in ONE model.DecodePolicy resolved from the environment at the
sampling.sample() boundary. These tests pin (a) the formulations to each
other so a perf experiment can never silently change the math, and (b) the
measured auto-dispatch policy table so it can't drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S


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


def test_layer_norm_one_pass_large_mean_offset():
    """E[x^2] - mean^2 cancels catastrophically when |mean| >> std. With
    x ~ N(100, 1) in fp32, E[x^2] ~ 1e4 holds ~19 significant bits around
    the mean-square — the subtraction keeps only ~4-5 bits of the variance.
    This test DOCUMENTS the accepted error envelope (normalized output
    within ~7% of the two-pass reference at mean=100) so a future
    checkpoint with far-outlier activation distributions fails loudly here
    rather than silently degrading samples. Unit-scale activations (every
    real checkpoint layer measured) are bit-par with the parity suites."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (32, 1536), jnp.float32) + 100.0
    ones, zeros = jnp.ones((1536,)), jnp.zeros((1536,))
    got = M.layer_norm(x, ones, zeros)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    want = (x32 - mean) * jax.lax.rsqrt(var + M.LN_EPS)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert np.isfinite(np.asarray(got)).all()
    assert err < 0.07, f"one-pass LN error grew past the documented envelope: {err}"


@pytest.mark.parametrize("score_mode", ["vpu", "mxu"])
@pytest.mark.parametrize("v_mode", ["vpu", "mxu"])
def test_decode_attention_modes_agree(score_mode, v_mode):
    B, T, C, nh = 4, 9, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q, k, v = (jax.random.normal(ks[i], (B, 1, C)) for i in range(3))
    k_l, v_l = (jax.random.normal(ks[3 + i], (B, T, C)) for i in range(2))
    got = M._decode_attention_xla(
        q, k, v, k_l, v_l, jnp.int32(5), nh, mode=score_mode, v_mode=v_mode
    )
    ref = M._decode_attention_xla(
        q, k, v, k_l, v_l, jnp.int32(5), nh, mode="vpu", v_mode="vpu"
    )
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
    """Pin the measured auto policy (COVERAGE.md round-3 perf notes): the
    fused-cache-write attention kernel wins at EVERY batch where legal, and
    the dense kernels only engage when the attention stays on XLA. On
    non-TPU backends everything falls back to XLA."""
    C, nh, dt = 1536, 24, jnp.bfloat16
    kw = dict(t_max=64, C=C, n_head=nh, dtype=dt, cache_T=64)

    # CPU (tests force it): all pallas off in auto
    assert M.resolve_attn_backend("auto", batch=500, **kw) != "pallas"
    assert M.resolve_dense_backend("auto", batch=100, C=C, dtype=dt) == "xla"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for batch in (100, 200, 500):
        attn = M.resolve_attn_backend("auto", batch=batch, **kw)
        assert attn == "pallas"
        assert (
            M.resolve_dense_backend(
                "auto", batch=batch, C=C, dtype=dt, attn_backend=attn
            )
            == "xla"
        )
    # when attention falls back to XLA (e.g. short windows), small batches
    # still get the dense weight-streaming kernels
    assert (
        M.resolve_dense_backend(
            "auto", batch=100, C=C, dtype=dt, attn_backend="vpu"
        )
        == "pallas"
    )
    # short cache windows (t_max < 32) keep the XLA attention crossover
    kw16 = dict(t_max=16, C=C, n_head=nh, dtype=dt, cache_T=16)
    assert M.resolve_attn_backend("auto", batch=100, **kw16) == "vpu"
    assert M.resolve_attn_backend("auto", batch=200, **kw16) == "mxu"
    # tiny head caches never take the attention kernel (fall back by batch)
    assert (
        M.resolve_attn_backend(
            "auto", batch=500, t_max=4, C=C, n_head=nh, dtype=dt, cache_T=4
        )
        == "mxu"
    )
    # forced modes override
    assert M.resolve_attn_backend("pallas", batch=100, **kw) == "pallas"
    assert M.resolve_dense_backend("xla", batch=100, C=C, dtype=dt) == "xla"
    # stacked path: B*t_max crossover at 10000, pallas not wired -> XLA
    assert M.resolve_attn_backend("auto", batch=10, stacked=True, **kw) == "vpu"
    assert (
        M.resolve_attn_backend("auto", batch=200, stacked=True, **kw) == "mxu"
    )
    assert (
        M.resolve_attn_backend("pallas", batch=500, stacked=True, **kw) == "mxu"
    )


def test_pallas_attn_window_alignment_legality(monkeypatch):
    """An unaligned cache allocation whose rounded window would overrun it
    must be ILLEGAL for the pallas kernel (Mosaic rejects unaligned
    second-minor block shapes); aligned allocations and in-cache rounded
    windows are fine."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    C, nh, dt = 1536, 24, jnp.bfloat16  # sublane tile 16
    # cache_T=33 unaligned, window 33 rounds to 48 > 33 -> illegal
    assert not M._pallas_attn_legal(33, C, nh, dt, cache_T=33)
    # aligned cache: window rounds up inside the allocation -> legal
    assert M._pallas_attn_legal(33, C, nh, dt, cache_T=48)
    # unaligned cache but rounded window still fits -> legal (W aligned)
    assert M._pallas_attn_legal(30, C, nh, dt, cache_T=33)
    # the sampler allocates tile-rounded caches, so its geometry is legal
    # for ANY cond_len (the round-2 advisor finding)
    for cond_len in (1, 7, 33):
        t_max = cond_len + 64 - 1
        t_alloc = -(-t_max // 16) * 16
        assert M._pallas_attn_legal(t_max, C, nh, dt, cache_T=t_alloc)


def test_decode_policy_from_env(monkeypatch):
    """sample() resolves env knobs ONCE at its plain-Python boundary; the
    resolved DecodePolicy is the static jit key, so env flips between calls
    take effect (the round-2 advisor finding about trace-time env reads)."""
    for var in (
        "RQVAE_TPU_DECODE_ATTN", "RQVAE_TPU_DECODE_ATTN_V",
        "RQVAE_TPU_DECODE_DENSE", "RQVAE_TPU_SAMPLE_UNROLL",
        "RQVAE_TPU_SAMPLE_PHASES", "RQVAE_TPU_SAMPLE_EXACT",
    ):
        monkeypatch.delenv(var, raising=False)
    assert M.decode_policy_from_env() == M.DecodePolicy()

    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN", "mxu")
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN_V", "mxu")
    monkeypatch.setenv("RQVAE_TPU_DECODE_DENSE", "pallas")
    monkeypatch.setenv("RQVAE_TPU_SAMPLE_UNROLL", "0")
    monkeypatch.setenv("RQVAE_TPU_SAMPLE_PHASES", "3")
    monkeypatch.setenv("RQVAE_TPU_SAMPLE_EXACT", "1")
    pol = M.decode_policy_from_env()
    assert pol == M.DecodePolicy(
        attn="mxu", attn_v="mxu", dense="pallas", unroll=False,
        phases=3, exact_sample=True,
    )
    # the experimental whole-layer megakernel is a valid forced dense mode
    monkeypatch.setenv("RQVAE_TPU_DECODE_DENSE", "mega")
    assert M.decode_policy_from_env().dense == "mega"
    # bad values warn and fall back
    monkeypatch.setenv("RQVAE_TPU_DECODE_ATTN", "warp")
    monkeypatch.setenv("RQVAE_TPU_SAMPLE_PHASES", "two")
    with pytest.warns(UserWarning):
        pol = M.decode_policy_from_env()
    assert pol.attn == "auto" and pol.phases == 2


def test_exact_and_fast_sampling_same_support():
    """Exact and fast draws come from the same kept set on tie-free logits
    (the induced distributions are pinned equal in
    test_fast_filtering_matches_reference_distribution); without any
    filtering the two are draw-for-draw identical (categorical is
    shift-invariant, so log-softmax vs raw logits draw the same Gumbel
    argmax). They differ ONLY when distinct vocab entries share the exact
    k-th logit value: the reference keeps all tied entries, fast keeps
    exactly k."""
    key = jax.random.PRNGKey(7)
    B, V = 16, 257
    logits = jax.random.normal(key, (B, V), jnp.float32) * 3.0

    for i in range(5):
        r = jax.random.PRNGKey(100 + i)
        a = S.sample_from_logits(r, logits, 0.9, None, None)
        b = S.sample_from_logits_fast(r, logits, 0.9, None, None)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for tk, tp in [(50, None), (None, 0.9), (50, 0.9), (8, 0.5)]:
        # reference kept-set (exact path, pre-draw)
        l = np.asarray(logits, np.float32) / 0.9
        if tk is not None and tk < V:
            l = np.asarray(S.top_k_logits(jnp.asarray(l), tk))
        p_ref = np.asarray(jax.nn.softmax(jnp.asarray(l), axis=-1))
        if tp is not None:
            p_ref = np.asarray(S.top_p_probs(jnp.asarray(p_ref), tp))
        for i in range(5):
            r = jax.random.PRNGKey(200 + i)
            a = np.asarray(S.sample_from_logits(r, logits, 0.9, tk, tp))
            b = np.asarray(S.sample_from_logits_fast(r, logits, 0.9, tk, tp))
            assert (p_ref[np.arange(B), a] > 0).all()
            assert (p_ref[np.arange(B), b] > 0).all()


def test_sample_policy_exact_mode_runs():
    """End-to-end: the exact-tie draw is selectable through the policy and
    produces the same-shaped output; with tie-free random logits the two
    policies draw identical codes."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[2, 2, 2],
        embed_dim=64, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 1, "block": {"n_head": 4}},
        head={"n_layer": 1, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    rng = jax.random.PRNGKey(1)
    # without filtering the exact and fast draws are identical (shift
    # invariance), so the whole sampled grid must match across policies
    fast = S.sample(
        params, config, rng, 4, policy=M.DecodePolicy(exact_sample=False)
    )
    exact = S.sample(
        params, config, rng, 4, policy=M.DecodePolicy(exact_sample=True)
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(exact))
    # with filtering: shapes/support sane
    filt = S.sample(
        params, config, rng, 4, top_k=8, top_p=0.9,
        policy=M.DecodePolicy(exact_sample=True),
    )
    assert filt.shape == fast.shape
    assert (np.asarray(filt) >= 0).all() and (np.asarray(filt) < 32).all()


def test_sample_kv_q8_policy_end_to_end():
    """Opt-in int8 body KV cache (DecodePolicy.kv_q8): the sampler
    allocates per-layer (kq, k_scale, vq, v_scale) caches, quantizes
    writes and runs attention over the quantized cache (Pallas on TPU,
    dequant-XLA here). The draws must be deterministic, in-support, and
    track the bf16-cache run closely — quantization perturbs logits by
    ~1/127 of each head's absmax, far below typical top-1 margins, so the
    fixed-seed sampled grids are pinned to high agreement (deterministic,
    not a statistical test)."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[3, 3, 2],
        embed_dim=64, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 4}},
        head={"n_layer": 1, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    rng = jax.random.PRNGKey(1)
    base = S.sample(params, config, rng, 8, policy=M.DecodePolicy())
    q8 = S.sample(params, config, rng, 8, policy=M.DecodePolicy(kv_q8=True))
    q8b = S.sample(params, config, rng, 8, policy=M.DecodePolicy(kv_q8=True))
    np.testing.assert_array_equal(np.asarray(q8), np.asarray(q8b))
    assert q8.shape == base.shape
    a = np.asarray(base).ravel()
    b = np.asarray(q8).ravel()
    assert (b >= 0).all() and (b < 32).all()
    agree = (a == b).mean()
    assert agree >= 0.9, f"kv_q8 sampled grid diverged: agreement {agree}"


def test_sample_kv_q8_with_int8_weights():
    """int8 weight-only quantization composes with the int8 KV cache —
    this is the BENCH_INT8 bench configuration (bench.py defaults
    RQVAE_TPU_KV_Q8=1). The two quantizations are independent (weights
    stream through the dense path, the cache through attention), so the
    combined run must stay deterministic, in-support, and track the
    int8-weights/bf16-cache run as closely as kv_q8 alone tracks bf16."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[3, 3, 2],
        embed_dim=64, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 4}},
        head={"n_layer": 1, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    qparams = M.quantize_transformer_params(params)
    rng = jax.random.PRNGKey(1)
    base = S.sample(qparams, config, rng, 8, policy=M.DecodePolicy())
    both = S.sample(
        qparams, config, rng, 8, policy=M.DecodePolicy(kv_q8=True)
    )
    both2 = S.sample(
        qparams, config, rng, 8, policy=M.DecodePolicy(kv_q8=True)
    )
    np.testing.assert_array_equal(np.asarray(both), np.asarray(both2))
    a = np.asarray(base).ravel()
    b = np.asarray(both).ravel()
    assert (b >= 0).all() and (b < 32).all()
    agree = (a == b).mean()
    assert agree >= 0.9, f"int8+kv_q8 sampled grid diverged: agreement {agree}"


def test_sample_kv_q8_stacked_path_warns_and_ignores():
    """kv_q8 needs per-layer caches; the stacked-cache scan must warn and
    run with the bf16 cache instead of crashing."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=16, block_size=[2, 2, 2],
        embed_dim=64, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 1, "block": {"n_head": 4}},
        head={"n_layer": 1, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    with pytest.warns(UserWarning, match="kv_q8"):
        out = S.sample(
            params, config, jax.random.PRNGKey(1), 4,
            policy=M.DecodePolicy(unroll=False, kv_q8=True),
        )
    assert out.shape == (4, 2, 2, 2)


def test_dense_kernel_dispatch_executes_on_cpu_interpret():
    """The shipped dense weight-streaming dispatch (policy.dense='pallas':
    model.py dense_ok branch -> fused_ln_qkv + fused_proj_mlp, q8 variants
    for fully-quantized layers) EXECUTES here in interpret mode and matches
    the XLA formulation. The kernels themselves are pinned by
    tests/test_decode_layer_kernel.py; this pins the dispatch plumbing,
    which previously only TPU runs executed end-to-end."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[4, 4, 2],
        embed_dim=128, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 2}},
        head={"n_layer": 1, "block": {"n_head": 2}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    B, T = 4, 24  # fp32 sublane tile multiple
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 128), jnp.float32)
    cur_len = jnp.int32(5)

    xla_pol = M.DecodePolicy(attn="vpu", dense="xla", unroll=True)
    dk_pol = M.DecodePolicy(
        attn="vpu", dense="pallas", unroll=True, interpret=True
    )
    assert M.resolve_dense_backend(
        "pallas", batch=B, C=128, dtype=jnp.float32, interpret=True
    ) == "pallas"

    for quantize in (False, True):
        stack = params["body"]
        if quantize:
            stack = M.quantize_stack_params(stack)
        lps = M.split_layer_params(stack, config.body)
        if quantize:
            # fully-quantized layers must route to the q8 kernels
            assert isinstance(lps[0]["attn"]["wqkv"], M.QuantizedWeight)
        caches = M.init_unrolled_kv_cache(config.body, B, T, jnp.float32)
        y0, c0 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=xla_pol
        )
        y1, c1 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=dk_pol
        )
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=2e-4, atol=2e-4,
            err_msg=f"dense kernel path diverged (quantize={quantize})",
        )
        for (k0, v0), (k1, v1) in zip(c0, c1):
            np.testing.assert_allclose(np.asarray(k1), np.asarray(k0), atol=2e-4)
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=2e-4)


def test_q8_cache_pallas_dispatch_executes_on_cpu_interpret():
    """The kv_q8 Pallas dispatch in stack_step_unrolled (the fused
    in-kernel quantize+write decode_attention_q8_update branch for
    32-row-aligned caches, and the XLA-dequant fallback for unaligned
    ones) EXECUTES here in interpret mode and matches the XLA-dequant
    formulation. The kernels are pinned in tests/test_attention_kernel.py;
    this pins the dispatch plumbing, previously TPU-only."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[4, 4, 2],
        embed_dim=128, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 2}},
        head={"n_layer": 1, "block": {"n_head": 2}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    lps = M.split_layer_params(params["body"], config.body)
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 128), jnp.float32)

    xla_pol = M.DecodePolicy(attn="vpu", unroll=True)
    pk_pol = M.DecodePolicy(attn="pallas", unroll=True, interpret=True)

    for T, fused in ((64, True), (40, False)):
        caches = M.init_unrolled_kv_cache_q8(config.body, B, T)
        # pre-populate a few rows so attention reads non-trivial history
        pre, caches = M.stack_step_unrolled(
            lps, jnp.tile(x, (1, 3, 1)), caches, jnp.int32(0),
            config.body, policy=xla_pol,
        )
        cur_len = jnp.int32(3)
        y0, c0 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=xla_pol
        )
        y1, c1 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=pk_pol
        )
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y0, np.float32),
            rtol=3e-3, atol=3e-3,
            err_msg=f"q8 pallas dispatch diverged (T={T}, fused={fused})",
        )
        # the written caches must agree up to quantization rounding: both
        # paths use the per-(token,head) absmax/127 rule but round the
        # scale/codes in different fp orders -> codes may differ by 1
        for t0, t1 in zip(c0, c1):
            for a, b in zip(t0, t1):
                tol = 1.0 if a.dtype == jnp.int8 else 2e-2
                np.testing.assert_allclose(
                    np.asarray(b, np.float32), np.asarray(a, np.float32),
                    atol=tol, rtol=2e-2,
                    err_msg=f"q8 cache write diverged (T={T}, fused={fused})",
                )


def test_q8_attn_wo_fold_dispatch_executes_on_cpu_interpret():
    """The attn_wo dispatch in stack_step_unrolled (wo projection +
    residual + LN2 folded into the q8 fused-write kernel,
    DecodePolicy.attn_wo) EXECUTES here in interpret mode and matches the
    unfolded q8 pallas path layer output AND cache writes. Covers both
    int8-quantized and plain wo weights."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[4, 4, 2],
        embed_dim=128, input_embed_dim=16, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=True, vocab_size_cond=4, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 2}},
        head={"n_layer": 1, "block": {"n_head": 2}},
    )
    config = TransformerConfig.create(
        augment_arch_defaults(Config(arch)).to_dict()
    )
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    B, T = 4, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 128), jnp.float32)
    pk_pol = M.DecodePolicy(attn="pallas", unroll=True, interpret=True)
    wo_pol = pk_pol._replace(attn_wo=True)

    for quantized in (False, True):
        p = M.quantize_transformer_params(params) if quantized else params
        lps = M.split_layer_params(p["body"], config.body)
        caches = M.init_unrolled_kv_cache_q8(config.body, B, T)
        pre, caches = M.stack_step_unrolled(
            lps, jnp.tile(x, (1, 3, 1)), caches, jnp.int32(0),
            config.body, policy=M.DecodePolicy(attn="vpu", unroll=True),
        )
        cur_len = jnp.int32(3)
        y0, c0 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=pk_pol
        )
        y1, c1 = M.stack_step_unrolled(
            lps, x, caches, cur_len, config.body, policy=wo_pol
        )
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y0, np.float32),
            rtol=3e-3, atol=3e-3,
            err_msg=f"attn_wo fold diverged (quantized={quantized})",
        )
        # layer 1's write is bit-equal; deeper layers see an activation that
        # differs by the folded wo dot's fp rounding, so their k/v rows may
        # quantize +-1 code apart (same tolerance as the q8 dispatch test)
        for t0, t1 in zip(c0, c1):
            for a, b in zip(t0, t1):
                tol = 1.0 if a.dtype == jnp.int8 else 2e-2
                np.testing.assert_allclose(
                    np.asarray(b, np.float32), np.asarray(a, np.float32),
                    atol=tol, rtol=2e-2,
                    err_msg=f"attn_wo cache write diverged (quantized={quantized})",
                )
