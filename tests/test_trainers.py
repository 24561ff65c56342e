"""Trainer step tests (tiny configs, CPU 8-device mesh where relevant)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.losses.discriminator import NLayerDiscriminator
from rqvae_tpu.losses.lpips import LPIPS, init_lpips
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.models.rqvae.model import RQVAE, RQVAEHParams
from rqvae_tpu.models.rqvae.modules import DDConfig
from rqvae_tpu.optim.optimizer import create_optimizer
from rqvae_tpu.optim.schedule import create_schedule
from rqvae_tpu.trainers import trainer_stage1 as t1
from rqvae_tpu.trainers import trainer_stage2 as t2
from rqvae_tpu.utils.config import Config, augment_arch_defaults

DD = dict(
    double_z=False, z_channels=16, resolution=32, in_channels=3, out_ch=3,
    ch=16, ch_mult=[1, 2, 2, 2], num_res_blocks=1, attn_resolutions=[4], dropout=0.0,
)
HP = dict(
    embed_dim=16, n_embed=64, loss_type="mse", latent_shape=[4, 4, 16],
    code_shape=[4, 4, 2], shared_codebook=True, restart_unused_codes=True,
)


def make_stage1():
    model = RQVAE(
        hparams=RQVAEHParams.create(HP), ddconfig=DDConfig.create(DD), use_kernel=False
    )
    disc = NLayerDiscriminator(ndf=16, n_layers=2)
    lpips = LPIPS()
    lpips_vars = init_lpips()
    sched = create_schedule(
        base_lr=4e-5,
        warmup_config={"epoch": 0.5, "mode": "fix", "multiplier": 1, "min_lr": 4e-5,
                       "buffer_epoch": 0, "start_from_zero": True},
        steps_per_epoch=10, max_epoch=10,
    )
    tx = create_optimizer({"type": "adam", "betas": [0.5, 0.9], "weight_decay": 0.0}, sched)
    disc_tx = create_optimizer({"type": "adam", "betas": [0.5, 0.9], "weight_decay": 0.0}, sched)
    gan_cfg = t1.GanLossConfig(disc_start=0)
    return model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg


class TestStage1:
    @pytest.mark.parametrize("use_disc", [True, False])
    def test_train_step(self, use_disc):
        model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg = make_stage1()
        state = t1.init_state(
            jax.random.PRNGKey(0), model, disc, tx, disc_tx, image_shape=(32, 32, 3)
        )
        step = jax.jit(
            t1.make_train_step(
                model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
                use_discriminator=use_disc,
            )
        )
        batch = {"images": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 2 - 1}
        old_embed = np.asarray(state.codebook["state"].embed)
        old_params = jax.device_get(state.params)

        new_state, metrics, codes = step(state, batch, jax.random.PRNGKey(2))
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        assert codes.shape == (4, 4, 4, 2)
        # EMA codebook updated
        assert np.abs(np.asarray(new_state.codebook["state"].embed) - old_embed).sum() > 0
        if use_disc:
            assert float(metrics["g_weight"]) >= 0
            assert int(new_state.disc_step) == 1
        else:
            assert float(metrics["loss_gen"]) == 0
            assert int(new_state.disc_step) == 0

        # second step: warmup lr is 0 at step 0 (start_from_zero, like the
        # reference GradualWarmup), so params move from step 2 onward
        new_state2, metrics2, _ = step(new_state, batch, jax.random.PRNGKey(2))
        assert int(new_state2.step) == 2
        new_params = jax.device_get(new_state2.params)
        diff = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(np.abs(a - b).sum()), old_params, new_params),
        )
        assert diff > 0

    def test_amp_bf16_train_step(self):
        """Opt-in stage-1 AMP (GanLossConfig.amp_bf16): bf16 activations,
        fp32 params/opt/codebook. Two steps run finite, params move, and
        the codebook EMA state stays fp32 (donation-safe across steps)."""
        model, disc, lpips, lpips_vars, tx, disc_tx, _ = make_stage1()
        gan_cfg = t1.GanLossConfig(disc_start=0, amp_bf16=True)
        state = t1.init_state(
            jax.random.PRNGKey(0), model, disc, tx, disc_tx, image_shape=(32, 32, 3)
        )
        step = jax.jit(
            t1.make_train_step(
                model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
                use_discriminator=True,
            )
        )
        batch = {"images": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 2 - 1}
        s1, m1, _ = step(state, batch, jax.random.PRNGKey(2))
        s2, m2, _ = step(s1, batch, jax.random.PRNGKey(2))
        for k, v in m2.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        assert s2.codebook["state"].embed.dtype == jnp.float32
        assert jax.tree.leaves(s2.params)[0].dtype == jnp.float32
        # bf16-compute losses track the fp32 step loosely on step 1
        fp32_step = jax.jit(
            t1.make_train_step(
                model, disc, lpips, lpips_vars,
                t1.GanLossConfig(disc_start=0), tx, disc_tx,
                use_discriminator=True,
            )
        )
        _, mf, _ = fp32_step(state, batch, jax.random.PRNGKey(2))
        a, b = float(m1["loss_recon"]), float(mf["loss_recon"])
        assert abs(a - b) < 0.05 * abs(b) + 1e-3, (a, b)

    def test_lpips_bf16_matches_fp32(self):
        """Train-time LPIPS runs the VGG tower in bf16 compute
        (GanLossConfig.lpips_bf16, default on); same params, fp32 loss out.
        Pin value agreement vs fp32 and finite grads through the bf16 tower."""
        lpips_vars = init_lpips()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.uniform(k1, (2, 64, 64, 3)) * 2 - 1
        y = jnp.clip(x + 0.1 * jax.random.normal(k2, x.shape), -1, 1)
        f32 = float(LPIPS().apply(lpips_vars, x, y))
        bf16 = float(LPIPS(dtype=jnp.bfloat16).apply(lpips_vars, x, y))
        assert np.asarray(bf16).dtype == np.float32 or isinstance(bf16, float)
        assert abs(bf16 - f32) < 0.05 * abs(f32) + 1e-4, (f32, bf16)
        g = jax.grad(lambda yy: LPIPS(dtype=jnp.bfloat16).apply(lpips_vars, x, yy))(y)
        assert np.isfinite(np.asarray(g)).all()

    def test_eval_step(self):
        model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg = make_stage1()
        state = t1.init_state(
            jax.random.PRNGKey(0), model, disc, tx, disc_tx, image_shape=(32, 32, 3)
        )
        eval_step = jax.jit(
            t1.make_eval_step(
                model, disc, lpips, lpips_vars, gan_cfg, use_discriminator=True
            )
        )
        batch = {"images": jnp.zeros((4, 32, 32, 3))}
        metrics, codes = eval_step(state, batch)
        assert np.isfinite(np.asarray(metrics["loss_total"]))


ARCH2 = dict(
    type="rq-transformer", vocab_size=64, block_size=[4, 4, 2], embed_dim=32,
    input_embed_dim=16, shared_tok_emb=True, shared_cls_emb=True,
    input_emb_vqvae=True, head_emb_vqvae=True, cumsum_depth_ctx=True,
    vocab_size_cond=10, block_size_cond=1,
    body={"n_layer": 2, "block": {"n_head": 4}},
    head={"n_layer": 1, "block": {"n_head": 4}},
)


class TestStage2:
    def test_frozen_encode_bf16(self):
        """make_frozen_encode_fn(dtype=bf16) tracks the fp32 encode closely
        (frozen path: GroupNorm stats fp32, distances promote to fp32) and
        the train step runs end-to-end on it with finite losses."""
        model = RQVAE(
            hparams=RQVAEHParams.create(HP), ddconfig=DDConfig.create(DD), use_kernel=False
        )
        x0 = jnp.zeros((2, 32, 32, 3))
        vq_vars = model.init(
            {"params": jax.random.PRNGKey(0), "quantizer": jax.random.PRNGKey(1)}, x0
        )
        imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3)) * 2 - 1
        z32 = t2.make_frozen_encode_fn(model, vq_vars, dtype=None)(imgs)
        zb16 = t2.make_frozen_encode_fn(model, vq_vars)(imgs)
        assert zb16.dtype == jnp.bfloat16 and z32.dtype == jnp.float32
        scale = float(np.abs(np.asarray(z32)).mean())
        err = float(np.abs(np.asarray(zb16, np.float32) - np.asarray(z32)).mean())
        assert err < 0.05 * scale + 1e-3, (err, scale)

    def test_frozen_encode_chunked_matches_unchunked(self):
        """chunk=k (lax.map over batch chunks) matches the one-shot encode
        within conv-retile accumulation noise (XLA picks per-batch-size conv
        tilings, so values move ~1e-3 relative even in fp32)."""
        model = RQVAE(
            hparams=RQVAEHParams.create(HP), ddconfig=DDConfig.create(DD), use_kernel=False
        )
        x0 = jnp.zeros((2, 32, 32, 3))
        vq_vars = model.init(
            {"params": jax.random.PRNGKey(0), "quantizer": jax.random.PRNGKey(1)}, x0
        )
        imgs = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)) * 2 - 1
        z32 = np.asarray(t2.make_frozen_encode_fn(model, vq_vars, dtype=None)(imgs))
        z32_c = np.asarray(
            t2.make_frozen_encode_fn(model, vq_vars, dtype=None, chunk=2)(imgs)
        )
        np.testing.assert_allclose(z32_c, z32, rtol=5e-3, atol=1e-5)
        zb = np.asarray(t2.make_frozen_encode_fn(model, vq_vars)(imgs), np.float32)
        zb_c = np.asarray(
            t2.make_frozen_encode_fn(model, vq_vars, chunk=2)(imgs), np.float32
        )
        scale = np.abs(z32).mean()
        assert np.abs(zb_c - zb).mean() < 0.02 * scale
        # args-mode carries the same chunking
        fn, enc_vars = t2.make_frozen_encode_fn(
            model, vq_vars, dtype=None, as_args=True, chunk=4
        )
        np.testing.assert_allclose(
            np.asarray(fn(imgs, enc_vars)), z32, rtol=5e-3, atol=1e-5
        )

    def test_train_step_with_frozen_stage1(self):
        model = RQVAE(
            hparams=RQVAEHParams.create(HP), ddconfig=DDConfig.create(DD), use_kernel=False
        )
        x0 = jnp.zeros((2, 32, 32, 3))
        vq_vars = model.init(
            {"params": jax.random.PRNGKey(0), "quantizer": jax.random.PRNGKey(1)}, x0
        )
        config = TransformerConfig.create(
            augment_arch_defaults(Config(ARCH2)).to_dict()
        )
        loss_cfg = t2.Stage2LossConfig(use_soft_target=True, temp=0.5, stochastic_codes=True)
        sched = create_schedule(
            base_lr=5e-4,
            warmup_config={"epoch": 0, "mode": "fix", "multiplier": 1, "min_lr": 0.0,
                           "start_from_zero": True},
            steps_per_epoch=10, max_epoch=10,
        )
        tx = create_optimizer(
            {"type": "adamW", "betas": [0.9, 0.95], "weight_decay": 1e-4, "max_gn": 1.0},
            sched,
        )
        state = t2.init_state(jax.random.PRNGKey(2), config, tx, use_ema=True)

        step = jax.jit(
            t2.make_train_step(
                config, loss_cfg, tx,
                encode_fn=lambda imgs: model.apply(vq_vars, imgs, method=RQVAE.encode),
                vq_state=vq_vars["codebook"]["state"],
                vq_config=model.quantizer_config,
                grad_accum_steps=2,
            )
        )
        batch = {
            "images": jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3)) * 2 - 1,
            "cond": jnp.zeros((4,), jnp.int32),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(metrics["loss_total"]))
        assert float(metrics["grad_norm"]) > 0
        assert int(new_state.step) == 1
        # EMA params moved toward new params
        d = jax.tree.map(lambda e, p: float(np.abs(e - p).max()),
                         new_state.ema_params, new_state.params)
        assert jax.tree.reduce(max, d) > 0

    def test_remat_matches_plain(self):
        """Stage2LossConfig.remat (jax.checkpoint on the layer-scan body)
        changes memory, not math: loss and grads match the plain path."""
        from rqvae_tpu.trainers.trainer_stage2 import loss_fn

        config = TransformerConfig.create(
            augment_arch_defaults(Config(ARCH2)).to_dict()
        )
        params = jax.jit(
            lambda k: __import__(
                "rqvae_tpu.models.rqtransformer.model", fromlist=["model"]
            ).init_transformer_params(k, config)
        )(jax.random.PRNGKey(0))
        codes = jax.random.randint(jax.random.PRNGKey(1), (2, 4, 4, 2), 0, 64)
        cond = jnp.zeros((2,), jnp.int32)
        xs_emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 2, 16))

        def run(remat):
            cfg = t2.Stage2LossConfig(
                use_soft_target=False, amp_bf16=False, remat=remat
            )
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, config, cfg, codes, None, cond, xs_emb, None,
                deterministic=True,
            )
            return loss, grads

        l0, g0 = run(False)
        l1, g1 = run(True)
        assert np.allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            g0, g1,
        )

    def test_text_conditional_losses(self):
        arch = {**ARCH2, "vocab_size_cond": 16, "block_size_cond": 4}
        config = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())
        loss_cfg = t2.Stage2LossConfig(
            use_soft_target=False, txt_weight=0.1, img_weight=0.9
        )
        sched = create_schedule(
            base_lr=5e-4,
            warmup_config={"epoch": 0, "mode": "fix", "multiplier": 1, "min_lr": 0.0,
                           "start_from_zero": True},
            steps_per_epoch=10, max_epoch=10,
        )
        tx = create_optimizer({"type": "adamW", "betas": [0.9, 0.95]}, sched)
        state = t2.init_state(jax.random.PRNGKey(0), config, tx)

        from rqvae_tpu.ops import quantize as rq

        vq_config = rq.QuantizerConfig.create((4, 4, 16), (4, 4, 2), 64, shared_codebook=True)
        vq_state = rq.init_codebook_state(jax.random.PRNGKey(1), vq_config)
        step = jax.jit(
            t2.make_train_step(
                config, loss_cfg, tx, vq_state=vq_state, vq_config=vq_config
            )
        )
        batch = {
            "codes": jax.random.randint(jax.random.PRNGKey(2), (2, 4, 4, 2), 0, 64),
            "cond": jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, 16),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
        assert "loss_txt" in metrics
        expected = 0.9 * float(metrics["loss_img"]) + 0.1 * float(metrics["loss_txt"])
        np.testing.assert_allclose(float(metrics["loss_total"]), expected, rtol=1e-5)


class TestSchedule:
    def test_warmup_then_cosine(self):
        sched = create_schedule(
            base_lr=1e-3,
            warmup_config={"epoch": 1, "mode": "fix", "multiplier": 1, "min_lr": 1e-5,
                           "buffer_epoch": 0, "start_from_zero": True},
            steps_per_epoch=100, max_epoch=10,
        )
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-5)
        # cosine end hits min_lr
        np.testing.assert_allclose(float(sched(1000)), 1e-5, rtol=1e-3)
        # monotone decreasing after warmup
        vals = [float(sched(s)) for s in range(100, 1000, 100)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    def test_stage1_fix_min_lr(self):
        # imagenet stage-1: warmup 0.5 epoch, min_lr==init_lr -> flat after
        sched = create_schedule(
            base_lr=4e-5,
            warmup_config={"epoch": 0.5, "mode": "fix", "multiplier": 1,
                           "min_lr": 4e-5, "buffer_epoch": 0, "start_from_zero": True},
            steps_per_epoch=100, max_epoch=10,
        )
        np.testing.assert_allclose(float(sched(999)), 4e-5, rtol=1e-4)


def test_decoder_tail_matches_full_decode():
    """modules.decoder_tail(raw params) must equal the decoder's final
    norm/act/conv (the stage-1 trainer relies on this split)."""
    from rqvae_tpu.models.rqvae.modules import Decoder, decoder_tail

    dd = DDConfig.create(DD)
    dec = Decoder(dd)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    variables = dec.init(jax.random.PRNGKey(1), z)
    full = dec.apply(variables, z)
    pre = dec.apply(variables, z, True, True)  # deterministic, give_pre_end
    tail = decoder_tail(variables["params"], pre, dd.out_ch)
    np.testing.assert_allclose(np.asarray(tail), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_stage1_ema_tracks_codebook():
    model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg = make_stage1()
    state = t1.init_state(
        jax.random.PRNGKey(0), model, disc, tx, disc_tx,
        image_shape=(32, 32, 3), use_ema=True,
    )
    assert state.ema_codebook is not None
    step = jax.jit(
        t1.make_train_step(model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
                           use_discriminator=False)
    )
    batch = {"images": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 2 - 1}
    old = np.asarray(state.ema_codebook["state"].embed)
    new_state, _, _ = step(state, batch, jax.random.PRNGKey(2))
    assert np.abs(np.asarray(new_state.ema_codebook["state"].embed) - old).sum() > 0
