"""RQ-Transformer parity vs the reference torch implementation.

Covers: teacher-forced forward logits (vqvae-emb and tok-emb input modes,
class and text conditioning), losses, and the scan sampler's logits against
the reference cached_forward at every (h, w, d) location.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rqvae_tpu.checkpoint import torch_convert as tc
from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq
from rqvae_tpu.utils.config import Config, augment_arch_defaults

from ref_loader import AttrDict, load_rqtransformer_modules, load_rqvae_modules


def make_ref_config(T, arch):
    """Build the reference RQTransformerConfig-like object from our dict."""
    blk = lambda s: AttrDict(
        embed_dim=arch["embed_dim"],
        n_head=s["block"]["n_head"],
        mlp_bias=True,
        attn_bias=True,
        attn_pdrop=0.0,
        resid_pdrop=0.0,
        gelu="v1",
    )
    return AttrDict(
        type="rq-transformer",
        vocab_size=arch["vocab_size"],
        block_size=list(arch["block_size"]),
        vocab_size_cond=arch.get("vocab_size_cond", 0),
        block_size_cond=arch.get("block_size_cond", 0),
        embed_dim=arch["embed_dim"],
        input_embed_dim=arch.get("input_embed_dim"),
        input_emb_vqvae=arch.get("input_emb_vqvae", False),
        head_emb_vqvae=arch.get("head_emb_vqvae", False),
        cumsum_depth_ctx=arch.get("cumsum_depth_ctx", False),
        shared_tok_emb=arch.get("shared_tok_emb", False),
        shared_cls_emb=arch.get("shared_cls_emb", False),
        embd_pdrop=0.0,
        body=AttrDict(n_layer=arch["body"]["n_layer"], block=blk(arch["body"])),
        head=AttrDict(n_layer=arch["head"]["n_layer"], block=blk(arch["head"])),
    )


class FakeVQ(torch.nn.Module):
    """model_aux stand-in exposing get_code_emb_with_depth backed by the same
    codebooks as our CodebookState."""

    def __init__(self, embed_np, n_embed_list):
        super().__init__()
        self.tables = [torch.from_numpy(np.asarray(e)) for e in embed_np]
        self.n_embed_list = n_embed_list

    def get_code_emb_with_depth(self, code):
        outs = []
        for d in range(code.shape[-1]):
            t = self.tables[d if len(self.tables) > 1 else 0]
            outs.append(t[code[..., d].long()])
        return torch.stack(outs, dim=-2), None


ARCH_VQVAE = dict(
    type="rq-transformer",
    vocab_size=32,
    block_size=[4, 4, 3],
    embed_dim=64,
    input_embed_dim=16,
    shared_tok_emb=True,
    shared_cls_emb=True,
    input_emb_vqvae=True,
    head_emb_vqvae=True,
    cumsum_depth_ctx=True,
    vocab_size_cond=10,
    block_size_cond=1,
    body={"n_layer": 2, "block": {"n_head": 4}},
    head={"n_layer": 2, "block": {"n_head": 4}},
)

ARCH_TOKEMB = dict(
    type="rq-transformer",
    vocab_size=[24, 16, 12],
    block_size=[4, 4, 3],
    embed_dim=64,
    vocab_size_cond=7,
    block_size_cond=4,  # text-style prefix with cond classifier
    body={"n_layer": 2, "block": {"n_head": 4}},
    head={"n_layer": 2, "block": {"n_head": 4}},
)


def build_pair(arch, seed=0):
    """(ref torch model, our config, converted params, fake vqvae, vq pytree)."""
    _, _, _, T = load_rqtransformer_modules()
    torch.manual_seed(seed)
    cfg_dict = augment_arch_defaults(Config(arch)).to_dict()
    # parity runs without dropout
    cfg_dict["body"]["block"]["resid_pdrop"] = 0.0
    cfg_dict["head"]["block"]["resid_pdrop"] = 0.0
    ref = T.RQTransformer(make_ref_config(T, cfg_dict)).eval()

    config = TransformerConfig.create(cfg_dict)
    params = tc.convert_rqtransformer(ref.state_dict(), config)
    params = jax.tree.map(jnp.asarray, params)

    vq_state = vq_config = fake_vq = None
    if config.input_emb_vqvae or config.head_emb_vqvae:
        rng = np.random.RandomState(seed + 1)
        emb = rng.randn(1, 32, 16).astype(np.float32)
        vq_config = rq.QuantizerConfig.create(
            latent_shape=(4, 4, 16), code_shape=(4, 4, 3), n_embed=32,
            shared_codebook=True, restart_unused_codes=False,
        )
        vq_state = rq.CodebookState(
            embed=jnp.asarray(emb),
            cluster_size=jnp.zeros((1, 32)),
            embed_ema=jnp.asarray(emb),
        )
        fake_vq = FakeVQ(emb, [32, 32, 32])
    return ref, config, params, fake_vq, vq_state, vq_config


@pytest.mark.parametrize("arch", [ARCH_VQVAE, ARCH_TOKEMB], ids=["vqvae-emb", "tok-emb"])
def test_forward_parity(arch):
    ref, config, params, fake_vq, vq_state, vq_config = build_pair(arch)
    B = 2
    rng = np.random.RandomState(3)
    H, W, D = config.block_size
    xs = rng.randint(0, min(config.vocab_size), (B, H, W, D))
    cond = rng.randint(0, config.vocab_size_cond, (B, config.block_size_cond))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xs), fake_vq, cond=torch.from_numpy(cond))

    xs_emb = None
    if config.input_emb_vqvae:
        xs_emb = rq.embed_code_with_depth(
            jnp.asarray(xs.reshape(B, H * W, D)), vq_state, vq_config
        )
    out = M.forward(params, config, jnp.asarray(xs), jnp.asarray(cond), xs_emb)

    if config.block_size_cond > 1:
        ref_logits, ref_cond_logits = ref_out
        logits, cond_logits = out
        np.testing.assert_allclose(
            np.asarray(cond_logits), ref_cond_logits.numpy(), rtol=2e-3, atol=2e-4
        )
    else:
        ref_logits, logits = ref_out, out

    # NOTE: the reference LogitMask indexes logits[:, idx, v:] assuming 3D
    # input (primitives.py:87-88), so on the 5D teacher-forced path it
    # never actually masks; our implementation masks the [..., d, v_d:]
    # tails correctly. Compare only the valid vocab slice per depth.
    ref_np = ref_logits.numpy()
    mine = np.asarray(logits)
    for d in range(config.depth):
        v = config.vocab_size[d]
        np.testing.assert_allclose(
            mine[..., d, :v], ref_np[..., d, :v], rtol=2e-3, atol=2e-4
        )
        assert not np.isfinite(mine[..., d, v:]).any()


def test_loss_parity():
    ref, config, params, fake_vq, vq_state, vq_config = build_pair(ARCH_TOKEMB)
    B = 2
    rng = np.random.RandomState(4)
    H, W, D = config.block_size
    xs = rng.randint(0, min(config.vocab_size), (B, H, W, D))
    cond = rng.randint(0, config.vocab_size_cond, (B, config.block_size_cond))

    with torch.no_grad():
        ref_logits, ref_cond_logits = ref(torch.from_numpy(xs), None, torch.from_numpy(cond))
    logits, cond_logits = M.forward(params, config, jnp.asarray(xs), jnp.asarray(cond))

    # hard-target loss with properly masked vocab tails (the reference's
    # LogitMask is a no-op on the 5D path — see test_forward_parity note —
    # so apply the intended mask to the reference logits before xent)
    ref_masked = ref_logits.clone()
    for d in range(config.depth):
        ref_masked[..., d, config.vocab_size[d]:] = -float("inf")
    t_logits = ref_masked.reshape(-1, ref_masked.shape[-1])
    t_targets = torch.from_numpy(xs.reshape(-1))
    ref_loss = torch.nn.functional.cross_entropy(t_logits, t_targets)
    loss = M.compute_loss(logits, jnp.asarray(xs.reshape(-1)))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-3)

    ref_cond_loss = ref.compute_cond_loss(ref_cond_logits, torch.from_numpy(cond))
    cond_loss = M.compute_cond_loss(cond_logits, jnp.asarray(cond))
    np.testing.assert_allclose(float(cond_loss), float(ref_cond_loss), rtol=1e-3)

    # soft-target loss parity
    V0 = config.vocab_size[0]
    soft = rng.rand(B * H * W * D, V0).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    from rqvae.optimizer.loss import soft_target_cross_entropy as ref_stce

    ref_soft = ref_stce(t_logits[:, :V0], torch.from_numpy(soft))
    mine_soft = M.soft_target_cross_entropy(
        jnp.asarray(logits).reshape(-1, logits.shape[-1])[:, :V0], jnp.asarray(soft)
    )
    np.testing.assert_allclose(float(mine_soft), float(ref_soft), rtol=1e-3)

    # per-depth codebook loss (masked reference logits, same note as above)
    ref_cb = ref.compute_codebook_loss(ref_masked, torch.from_numpy(xs))
    cb = M.compute_codebook_loss(jnp.asarray(logits), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(cb), ref_cb.numpy(), rtol=1e-3, atol=1e-5)


# NOTE: the reference cached_forward CRASHES on heterogeneous vocab sizes
# (LogitMask indexes [:, idx, v:] on a [B, 1, V] tensor -> IndexError at
# primitives.py:88); cached parity is therefore tested with equal vocab
# sizes + per-depth BatchLinear heads (ARCH_TOKEMB_EQ). Our scan handles the
# heterogeneous case correctly (covered by test_forward_parity).
ARCH_TOKEMB_EQ = {**ARCH_TOKEMB, "vocab_size": [24, 24, 24]}


@pytest.mark.parametrize(
    "arch", [ARCH_VQVAE, ARCH_TOKEMB_EQ], ids=["vqvae-emb", "tok-emb-eq"]
)
def test_scan_step_logits_match_reference_cached_forward(arch):
    """Drive the reference sample() loop with its own cached_forward but a
    FIXED code sequence; capture logits at every (h,w,d) and compare with the
    logits our scan produces for the same forced codes."""
    ref, config, params, fake_vq, vq_state, vq_config = build_pair(arch)
    B = 2
    H, W, D = config.block_size
    rng = np.random.RandomState(5)
    forced = rng.randint(0, min(config.vocab_size), (B, H, W, D))
    cond = rng.randint(0, config.vocab_size_cond, (B, config.block_size_cond))

    # --- reference: cached_forward at each location with forced codes
    ref_logits_all = np.zeros((B, H, W, D, config.vocab_size_max), np.float32)
    with torch.no_grad():
        ref.init_cache()
        xs = torch.zeros((B, H, W, D), dtype=torch.long)
        for h in range(H):
            for w in range(W):
                for d in range(D):
                    lg = ref.cached_forward(
                        xs[:, : h + 1], fake_vq, cond=torch.from_numpy(cond),
                        sample_loc=(h, w, d),
                    )
                    V = lg.shape[-1]
                    ref_logits_all[:, h, w, d, :V] = lg.numpy()
                    xs[:, h, w, d] = torch.from_numpy(forced[:, h, w, d])

    # --- ours: replicate the scan step but force codes instead of sampling
    mine = _forced_logits(params, config, forced, cond, vq_state, vq_config)
    finite = np.isfinite(ref_logits_all)
    np.testing.assert_allclose(
        mine[finite], ref_logits_all[finite], rtol=2e-3, atol=2e-4
    )


def _forced_logits(params, config, forced, cond, vq_state, vq_config):
    """Shared with cli/parity_check.py --stage2 (sampling.forced_logits)."""
    return S.forced_logits(params, config, forced, cond, vq_state, vq_config)


def test_sample_runs_and_in_range():
    _, config, params, _, vq_state, vq_config = build_pair(ARCH_VQVAE)
    codes = S.sample(
        params,
        config,
        jax.random.PRNGKey(0),
        batch_size=2,
        cond=jnp.asarray([1, 2]),
        vq_state=vq_state,
        vq_config=vq_config,
        temperature=1.0,
        top_k=8,
        top_p=0.9,
    )
    H, W, D = config.block_size
    assert codes.shape == (2, H, W, D)
    for d in range(D):
        assert int(codes[..., d].max()) < config.vocab_size[d]
    assert int(codes.min()) >= 0


def test_sample_from_logits_matches_reference_distribution():
    """top-k/top-p filtering must produce the same *distribution* as the
    reference (draws differ: torch.multinomial vs jax categorical)."""
    from rqvae.utils.utils import sample_from_logits as ref_sfl  # noqa: F401
    from rqvae.utils.utils import top_p_probs as ref_top_p, top_k_logits as ref_top_k

    rng = np.random.RandomState(6)
    logits = rng.randn(8, 50).astype(np.float32) * 3

    ref_l = ref_top_k(torch.from_numpy(logits), 10).numpy()
    mine_l = np.asarray(S.top_k_logits(jnp.asarray(logits), 10))
    np.testing.assert_allclose(mine_l, ref_l, rtol=1e-5)

    probs = torch.softmax(torch.from_numpy(logits), dim=-1)
    ref_p = ref_top_p(probs.clone(), 0.8).numpy()
    mine_p = np.asarray(S.top_p_probs(jnp.asarray(probs.numpy()), 0.8))
    np.testing.assert_allclose(mine_p, ref_p, rtol=1e-4, atol=1e-6)


def test_fast_filtering_matches_reference_distribution():
    """sample_from_logits_fast must induce the same categorical distribution
    as the reference path: same kept set, same renormalized probabilities."""
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(16, 100).astype(np.float32) * 2)

    for top_k, top_p in [(20, 0.8), (None, 0.9), (20, None), (None, None), (150, 0.7)]:
        # reference-path probabilities
        l = np.asarray(logits, np.float32)
        if top_k is not None and top_k < l.shape[-1]:
            l = np.asarray(S.top_k_logits(jnp.asarray(l), top_k))
        p_ref = np.asarray(jax.nn.softmax(jnp.asarray(l), axis=-1))
        if top_p is not None:
            p_ref = np.asarray(S.top_p_probs(jnp.asarray(p_ref), top_p))

        # fast-path probabilities, reconstructed by drawing many samples is
        # noisy; instead rebuild them analytically the same way the kernel does
        V = logits.shape[-1]
        k = top_k if (top_k is not None and top_k < V) else V
        vals, idx = jax.lax.top_k(logits, k)
        probs = jax.nn.softmax(vals, axis=-1)
        if top_p is not None:
            cum = jnp.cumsum(probs, axis=-1)
            remove = cum >= top_p
            remove = jnp.concatenate(
                [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
            )
            probs = jnp.where(remove, 0.0, probs)
            probs = probs / probs.sum(-1, keepdims=True)
        p_fast = np.zeros_like(p_ref)
        np.put_along_axis(p_fast, np.asarray(idx), np.asarray(probs), axis=-1)

        np.testing.assert_allclose(p_fast, p_ref, rtol=1e-4, atol=1e-6)

        # and the jitted fast sampler returns in-support samples
        out = S.sample_from_logits_fast(
            jax.random.PRNGKey(0), logits, 1.0, top_k, top_p
        )
        assert out.shape == (16,)
        assert (np.asarray(p_ref)[np.arange(16), np.asarray(out)] > 0).all()


def test_incremental_head_equals_full_forward():
    """stack_step-based incremental decode over D rows must equal the full
    causal stack_forward row-by-row (the sampler's head path)."""
    from rqvae_tpu.models.rqtransformer.config import StackConfig

    cfg = StackConfig(n_layer=3, n_head=4, embed_dim=32, resid_pdrop=0.0)
    params = M.init_stack_params(jax.random.PRNGKey(0), cfg)
    B, D = 2, 4
    rows = jax.random.normal(jax.random.PRNGKey(1), (B, D, 32))

    full = M.stack_forward(params, rows, cfg)  # [B, D, C]

    cache = M.init_kv_cache(cfg, B, D)
    outs = []
    for d in range(D):
        h, cache = M.stack_step(params, rows[:, d : d + 1], cache, jnp.int32(d), cfg)
        outs.append(h[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), rtol=1e-4, atol=1e-5)


def test_int8_weight_only_quantization_accuracy():
    """Quantized forward must track the fp32 forward closely (weight-only
    per-channel int8), and the quantized sampler must run."""
    _, config, params, _, vq_state, vq_config = build_pair(ARCH_VQVAE)
    qparams = M.quantize_transformer_params(params)

    B = 2
    rng = np.random.RandomState(11)
    H, W, D = config.block_size
    xs = rng.randint(0, min(config.vocab_size), (B, H, W, D))
    cond = rng.randint(0, config.vocab_size_cond, (B, 1))
    xs_emb = rq.embed_code_with_depth(
        jnp.asarray(xs.reshape(B, H * W, D)), vq_state, vq_config
    )
    ref = np.asarray(M.forward(params, config, jnp.asarray(xs), jnp.asarray(cond), xs_emb))
    qq = np.asarray(M.forward(qparams, config, jnp.asarray(xs), jnp.asarray(cond), xs_emb))
    # logits agree to ~1% of their dynamic range
    scale = np.abs(ref).max()
    assert np.abs(qq - ref).max() < 0.02 * scale

    codes = S.sample(
        qparams, config, jax.random.PRNGKey(0), 2,
        cond=jnp.asarray([1, 2]), vq_state=vq_state, vq_config=vq_config,
        top_k=8, top_p=0.9,
    )
    assert codes.shape == (2, H, W, D)


def test_unrolled_stack_step_equals_stacked():
    """stack_step_unrolled (per-layer caches, the sampler's decode path)
    must match stack_step on the stacked cache for prefill and decode."""
    from rqvae_tpu.models.rqtransformer.config import StackConfig

    cfg = StackConfig(n_layer=3, n_head=4, embed_dim=64, resid_pdrop=0.0)
    params = M.init_stack_params(jax.random.PRNGKey(0), cfg)
    lps = M.split_layer_params(params, cfg)
    B, t_max, S0 = 2, 9, 3

    cache = M.init_kv_cache(cfg, B, t_max)
    caches = M.init_unrolled_kv_cache(cfg, B, t_max)

    # prefill S0 rows, then 4 single-token decode steps
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S0, 64))
    h_a, cache = M.stack_step(params, x, cache, jnp.int32(0), cfg)
    h_b, caches = M.stack_step_unrolled(lps, x, caches, jnp.int32(0), cfg)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a), rtol=1e-5, atol=1e-5)

    for t in range(S0, S0 + 4):
        xt = jax.random.normal(jax.random.PRNGKey(10 + t), (B, 1, 64))
        h_a, cache = M.stack_step(params, xt, cache, jnp.int32(t), cfg)
        h_b, caches = M.stack_step_unrolled(lps, xt, caches, jnp.int32(t), cfg)
        np.testing.assert_allclose(
            np.asarray(h_b), np.asarray(h_a), rtol=1e-5, atol=1e-5
        )
    for i in range(cfg.n_layer):
        np.testing.assert_allclose(
            np.asarray(caches[i][0]), np.asarray(cache.k[i]), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(caches[i][1]), np.asarray(cache.v[i]), rtol=1e-6, atol=1e-6
        )


def test_sample_last_position_uses_no_body_advance():
    """The sampler's codes must be invariant to the optimisation that skips
    the final body advance: all positions' codes remain valid and the RNG
    stream is threaded identically (deterministic same-seed repeat)."""
    _, config, params, _, vq_state, vq_config = build_pair(ARCH_VQVAE)
    a = S.sample(params, config, jax.random.PRNGKey(3), 2,
                 cond=jnp.asarray([0, 1]), vq_state=vq_state, vq_config=vq_config,
                 top_k=8, top_p=0.9)
    b = S.sample(params, config, jax.random.PRNGKey(3), 2,
                 cond=jnp.asarray([0, 1]), vq_state=vq_state, vq_config=vq_config,
                 top_k=8, top_p=0.9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_d1_no_head_layers():
    """VQGAN-equivalent geometry: depth 1 with a 0-layer head (the
    classifier reads the spatial context row directly) must sample
    (measure_throughput f16-d1 path; regression for the unrolled step's
    empty-layer-list handling)."""
    arch = dict(
        type="rq-transformer", vocab_size=32, block_size=[4, 4, 1], embed_dim=64,
        input_embed_dim=16, shared_tok_emb=True, shared_cls_emb=True,
        input_emb_vqvae=True, head_emb_vqvae=True, cumsum_depth_ctx=True,
        vocab_size_cond=10, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 4}},
        head={"n_layer": 0, "block": {"n_head": 4}},
    )
    config = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    vq_config = rq.QuantizerConfig.create(
        (4, 4, 16), (4, 4, 1), 32, shared_codebook=True
    )
    vq_state = rq.init_codebook_state(jax.random.PRNGKey(1), vq_config)
    codes = S.sample(
        params, config, jax.random.PRNGKey(2), 2, cond=jnp.asarray([0, 1]),
        vq_state=vq_state, vq_config=vq_config, top_k=8,
    )
    assert codes.shape == (2, 4, 4, 1)
    assert int(codes.min()) >= 0 and int(codes.max()) < 32
