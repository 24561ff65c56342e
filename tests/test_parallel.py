"""Multi-device tests on the virtual 8-CPU mesh: sharded sampling, TP
transformer forward, data-parallel stage-1 step with psum'd codebook EMA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.utils.config import Config, augment_arch_defaults

ARCH = dict(
    type="rq-transformer", vocab_size=64, block_size=[4, 4, 2], embed_dim=64,
    input_embed_dim=16, shared_tok_emb=True, shared_cls_emb=True,
    input_emb_vqvae=True, head_emb_vqvae=True, cumsum_depth_ctx=True,
    vocab_size_cond=8, block_size_cond=1,
    body={"n_layer": 2, "block": {"n_head": 4}},
    head={"n_layer": 1, "block": {"n_head": 4}},
)


@pytest.fixture(scope="module")
def setup():
    config = TransformerConfig.create(augment_arch_defaults(Config(ARCH)).to_dict())
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    vq_config = rq.QuantizerConfig.create((4, 4, 16), (4, 4, 2), 64, shared_codebook=True)
    vq_state = rq.init_codebook_state(jax.random.PRNGKey(1), vq_config)
    return config, params, vq_state, vq_config


def test_sharded_sampling_matches_unsharded(setup):
    config, params, vq_state, vq_config = setup
    assert len(jax.devices()) == 8
    mesh = mesh_lib.create_mesh(8, 1)
    B = 16
    cond = jnp.arange(B, dtype=jnp.int32) % 8

    codes_single = S.sample(
        params, config, jax.random.PRNGKey(2), B, cond=cond,
        vq_state=vq_state, vq_config=vq_config, top_k=16, top_p=0.9,
    )

    cond_sharded = jax.device_put(cond, NamedSharding(mesh, P("data")))
    params_repl = jax.device_put(params, mesh_lib.replicated(mesh))
    codes_sharded = S.sample(
        params_repl, config, jax.random.PRNGKey(2), B, cond=cond_sharded,
        vq_state=vq_state, vq_config=vq_config, top_k=16, top_p=0.9,
    )
    # same program, same keys -> identical samples regardless of sharding
    np.testing.assert_array_equal(np.asarray(codes_single), np.asarray(codes_sharded))


def test_tensor_parallel_sampling_matches_unsharded(setup):
    """TP serving: params Megatron-sharded over 'model' (and the batch over
    'data'), the WHOLE jitted AR sampling scan partitioned by GSPMD —
    head-sharded KV caches, psum after row-parallel matmuls, vocab-split
    classifier gathered before the draw. Same keys -> identical codes.
    At this tiny geometry the Pallas kernel is illegal per shard
    (C/tp = 16 is no lane multiple), so a Pallas-forcing policy must fall
    back to the XLA attention formulations, and dense='pallas' must be
    pinned to XLA by sampling._tp_safe_policy (no SPMD rule for the dense
    custom calls)."""
    config, params, vq_state, vq_config = setup
    B = 8
    cond = jnp.arange(B, dtype=jnp.int32) % 8
    codes_single = S.sample(
        params, config, jax.random.PRNGKey(2), B, cond=cond,
        vq_state=vq_state, vq_config=vq_config, top_k=16, top_p=0.9,
    )

    mesh = mesh_lib.create_mesh(2, 4)  # 2-way DP x 4-way TP
    params_tp = mesh_lib.shard_pytree(
        params, mesh_lib.transformer_param_specs(params), mesh
    )
    cond_sh = jax.device_put(cond, NamedSharding(mesh, P("data")))
    # dense='pallas' would be an opaque unpartitionable custom call: the
    # sampler must detect the model-sharded params and pin XLA backends
    forced = M.DecodePolicy(attn="pallas", dense="pallas")
    with mesh:
        codes_tp = S.sample(
            params_tp, config, jax.random.PRNGKey(2), B, cond=cond_sh,
            vq_state=vq_state, vq_config=vq_config, top_k=16, top_p=0.9,
            policy=forced,
        )
    np.testing.assert_array_equal(np.asarray(codes_single), np.asarray(codes_tp))


def test_tensor_parallel_forward_matches_replicated(setup):
    config, params, vq_state, vq_config = setup
    mesh = mesh_lib.create_mesh(2, 4)  # 4-way TP
    specs = mesh_lib.transformer_param_specs(params)
    params_tp = mesh_lib.shard_pytree(params, specs, mesh)

    B = 4
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randint(0, 64, (B, 4, 4, 2)))
    cond = jnp.asarray(rng.randint(0, 8, (B, 1)))
    xs_emb = rq.embed_code_with_depth(xs.reshape(B, 16, 2), vq_state, vq_config)

    fwd = jax.jit(lambda p: M.forward(p, config, xs, cond, xs_emb))
    ref = np.asarray(fwd(params))
    with mesh:
        tp = np.asarray(fwd(params_tp))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(tp[finite], ref[finite], rtol=1e-4, atol=1e-5)


def test_codebook_ema_psum_equals_global_batch():
    """Data-parallel EMA update via shard_map psum must equal the
    single-device update on the concatenated batch (the reference's
    dist.all_reduce semantics, quantizations.py:100-102)."""
    from jax import shard_map

    mesh = mesh_lib.create_mesh(8, 1)
    cfg = rq.QuantizerConfig.create(
        (4, 4, 8), (4, 4, 2), 16, shared_codebook=False, restart_unused_codes=False
    )
    state = rq.init_codebook_state(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 8))

    # global single-device update
    _, _, _, ref_state = rq.rq_bottleneck_forward(
        x, state, cfg, training=True, use_kernel=False
    )

    def per_shard(x_shard, embed, cluster, ema):
        st = rq.CodebookState(embed=embed, cluster_size=cluster, embed_ema=ema)
        _, _, _, new = rq.rq_bottleneck_forward(
            x_shard, st, cfg, training=True, axis_name="data", use_kernel=False
        )
        return new.embed, new.cluster_size, new.embed_ema

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    embed, cluster, ema = fn(x, state.embed, state.cluster_size, state.embed_ema)
    np.testing.assert_allclose(np.asarray(cluster), np.asarray(ref_state.cluster_size), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ema), np.asarray(ref_state.embed_ema), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(embed), np.asarray(ref_state.embed), rtol=1e-4, atol=1e-5)


def test_zero_optimizer_state_sharding(setup):
    """ZeRO-1 placement: a train step with data-sharded optimizer moments
    must produce the same update as fully-replicated state."""
    import optax

    from rqvae_tpu.trainers import trainer_stage2 as t2

    config, params, vq_state, vq_config = setup
    mesh = mesh_lib.create_mesh(8, 1)
    tx = optax.adamw(1e-3)
    state = t2.init_state(jax.random.PRNGKey(0), config, tx)

    step = jax.jit(
        # amp_bf16 off: this test checks the ZeRO-1 PLACEMENT math at fp32
        # tolerances; bf16 matmul rounding is layout-sensitive across the
        # sharded/replicated pair (AMP itself is covered by the trainer tests)
        t2.make_train_step(config,
                           t2.Stage2LossConfig(use_soft_target=False,
                                               amp_bf16=False),
                           tx, vq_state=vq_state, vq_config=vq_config)
    )
    batch = {
        "codes": jax.random.randint(jax.random.PRNGKey(1), (8, 4, 4, 2), 0, 64),
        "cond": jnp.zeros((8,), jnp.int32),
    }
    ref_state, ref_metrics = step(state, batch, jax.random.PRNGKey(2))

    sharded = state.replace(
        opt_state=mesh_lib.shard_opt_state_zero(state.opt_state, mesh)
    )
    with mesh:
        z_state, z_metrics = step(sharded, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(z_metrics["loss_total"]), float(ref_metrics["loss_total"]), rtol=1e-5
    )
    a = jax.tree.leaves(ref_state.params)[0]
    b = jax.tree.leaves(z_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_stage1_full_step_sharded_equals_unsharded():
    """FULL stage-1 train step (codebook EMA + unused-code restart + LPIPS +
    adaptive weight + discriminator BatchNorm batch_stats) with the batch
    sharded over the 8-device data mesh must match the unsharded step —
    batch statistics must be computed globally, not per-shard-averaged
    (reference all_reduce semantics, quantizations.py:100-114; BN over the
    full batch). GSPMD proves this for the jit path; the shard_map psum path
    is covered by test_codebook_ema_psum_equals_global_batch."""
    from test_trainers import make_stage1
    from rqvae_tpu.trainers import trainer_stage1 as t1

    model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg = make_stage1()
    state = t1.init_state(
        jax.random.PRNGKey(0), model, disc, tx, disc_tx, image_shape=(32, 32, 3)
    )
    step = jax.jit(
        t1.make_train_step(
            model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
            use_discriminator=True,
        )
    )
    B = 16
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3)) * 2 - 1
    }
    ref_state, ref_metrics, ref_codes = step(state, batch, jax.random.PRNGKey(2))

    mesh = mesh_lib.create_mesh(8, 1)
    sharded_batch = {
        "images": jax.device_put(batch["images"], NamedSharding(mesh, P("data")))
    }
    state_repl = jax.device_put(state, mesh_lib.replicated(mesh))
    with mesh:
        sh_state, sh_metrics, sh_codes = step(
            state_repl, sharded_batch, jax.random.PRNGKey(2)
        )

    # codes: per-element argmin, no cross-batch reduction -> exact
    np.testing.assert_array_equal(np.asarray(ref_codes), np.asarray(sh_codes))
    # codebook EMA state: global-batch sums (reduction order differs between
    # the GSPMD partitioning and the single-device program -> fp32 noise)
    for name in ("embed", "cluster_size", "embed_ema"):
        np.testing.assert_allclose(
            np.asarray(getattr(sh_state.codebook["state"], name)),
            np.asarray(getattr(ref_state.codebook["state"], name)),
            rtol=1e-4, atol=1e-5, err_msg=f"codebook.{name} diverged under sharding",
        )
    # discriminator BN batch_stats: mean/var over the GLOBAL batch
    # (identical treedefs -> leaves align without sorting)
    for a, b in zip(
        jax.tree.leaves(sh_state.disc_batch_stats),
        jax.tree.leaves(ref_state.disc_batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg="disc batch_stats diverged under sharding",
        )
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(sh_metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5,
            err_msg=f"metric {k} diverged under sharding",
        )
    # updated generator params agree
    la = jax.tree.leaves(sh_state.params)
    lb = jax.tree.leaves(ref_state.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_tensor_parallel_sampling_uses_pallas_kernel_per_shard():
    """TP serving with the Pallas decode-attention kernel: when the
    per-shard geometry is legal (C/tp a lane multiple, heads divide the
    'model' axis), the sampler runs the fused-write kernel inside
    shard_map (model._pallas_attn_sharded) instead of falling back to the
    XLA formulations — each device streams its own [B_local, T, C/tp]
    cache block. Executed here in interpret mode on the 2x4 CPU mesh and
    compared bit-exactly against the same kernel on one device."""
    arch = dict(
        type="rq-transformer", vocab_size=64, block_size=[6, 6, 1],
        embed_dim=512, input_embed_dim=0, shared_tok_emb=False,
        shared_cls_emb=False, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=False, vocab_size_cond=8, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 8}},
        head={"n_layer": 1, "block": {"n_head": 8}},
    )
    config = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    B = 16
    cond = jnp.arange(B, dtype=jnp.int32) % 8
    policy = M.DecodePolicy(attn="pallas", unroll=True, interpret=True)

    # the per-shard geometry must be kernel-legal, and the resolver must
    # actually pick the kernel under the mesh
    mesh = mesh_lib.create_mesh(2, 4)
    t_max = config.block_size_cond + 36 - 1
    t_alloc = -(-t_max // 8) * 8  # fp32 sublane tile
    assert M.resolve_attn_backend(
        "pallas", batch=B, t_max=t_max, C=512, n_head=8,
        dtype=jnp.float32, cache_T=t_alloc, mesh=mesh, interpret=True,
    ) == "pallas"

    codes_single = S.sample(
        params, config, jax.random.PRNGKey(2), B, cond=cond,
        top_k=16, policy=policy,
    )

    params_tp = mesh_lib.shard_pytree(
        params, mesh_lib.transformer_param_specs(params), mesh
    )
    cond_sh = jax.device_put(cond, NamedSharding(mesh, P("data")))
    with mesh:
        codes_tp = S.sample(
            params_tp, config, jax.random.PRNGKey(2), B, cond=cond_sh,
            top_k=16, policy=policy,
        )
    np.testing.assert_array_equal(np.asarray(codes_single), np.asarray(codes_tp))


def test_tensor_parallel_sampling_kv_q8_kernel_per_shard():
    """TP serving with the int8 KV cache: the q8 fused-write kernel runs
    per shard (model._pallas_attn_q8_sharded) — each device quantizes and
    aliases its own [B_local, T, C/tp] int8 blocks plus the head-sliced
    [B_local, T, nh/tp] scale tensors. Per-(row, head) quantization is
    shard-local (head groups never mix), so the TP codes must bit-match the
    single-device q8 kernel. Interpret mode on the 2x4 CPU mesh."""
    arch = dict(
        type="rq-transformer", vocab_size=64, block_size=[6, 6, 1],
        embed_dim=512, input_embed_dim=0, shared_tok_emb=False,
        shared_cls_emb=False, input_emb_vqvae=False, head_emb_vqvae=False,
        cumsum_depth_ctx=False, vocab_size_cond=8, block_size_cond=1,
        body={"n_layer": 2, "block": {"n_head": 8}},
        head={"n_layer": 1, "block": {"n_head": 8}},
    )
    config = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())
    params = M.init_transformer_params(jax.random.PRNGKey(0), config)
    B = 16
    cond = jnp.arange(B, dtype=jnp.int32) % 8
    policy = M.DecodePolicy(
        attn="pallas", unroll=True, interpret=True, kv_q8=True
    )

    codes_single = S.sample(
        params, config, jax.random.PRNGKey(2), B, cond=cond,
        top_k=16, policy=policy,
    )

    mesh = mesh_lib.create_mesh(2, 4)
    # _tp_safe_policy must KEEP kv_q8 under the mesh (it used to drop it)
    assert S._tp_safe_policy(policy).kv_q8
    params_tp = mesh_lib.shard_pytree(
        params, mesh_lib.transformer_param_specs(params), mesh
    )
    cond_sh = jax.device_put(cond, NamedSharding(mesh, P("data")))
    with mesh:
        codes_tp = S.sample(
            params_tp, config, jax.random.PRNGKey(2), B, cond=cond_sh,
            top_k=16, policy=policy,
        )
    np.testing.assert_array_equal(np.asarray(codes_single), np.asarray(codes_tp))
