"""Stage-1 (RQ-VAE + VQGAN losses) training step.

TPU-native re-design of the reference TrainerRQVAE hot loop
(/root/reference/rqvae/trainers/trainer_rqvae.py:220-317): ONE jitted step
performs the generator update (recon + commitment + LPIPS + adaptive-weighted
GAN loss), the EMA codebook update (inside the quantizer, psum over the data
axis), and the discriminator update (hinge/vanilla) with its own
optimizer/schedule. The adaptive GAN weight replicates
calculate_adaptive_weight (trainer_rqvae.py:31-37): two extra grads of the
nll / generator losses w.r.t. ONLY the decoder's final conv kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.losses import gan as gan_losses
from rqvae_tpu.losses.discriminator import NLayerDiscriminator
from rqvae_tpu.losses.lpips import LPIPS
from rqvae_tpu.models import ema as ema_lib
from rqvae_tpu.models.rqvae.model import RQVAE


@flax.struct.dataclass
class Stage1State:
    step: jax.Array
    params: Any  # RQ-VAE params
    opt_state: Any
    codebook: Any  # {"state": CodebookState}
    disc_params: Any
    disc_opt_state: Any
    disc_batch_stats: Any
    disc_step: jax.Array
    ema_params: Any = None
    # reference EMA covers the FULL state_dict incl. quantizer buffers
    # (ema.py:37-48), so the codebook is EMA-tracked alongside the params
    ema_codebook: Any = None


@dataclasses.dataclass(frozen=True)
class GanLossConfig:
    disc_loss: str = "hinge"
    gen_loss: str = "vanilla"
    disc_weight: float = 0.75
    perceptual_weight: float = 1.0
    disc_start: int = 0
    # run the LPIPS VGG tower in bf16 (params stay fp32; loss returned
    # fp32). The tower appears 3x fwd + 3x bwd per step (main loss + the
    # adaptive-weight jacobian) and measured 69 of the 258 ms stage-1 step
    # at 256px/bs16; bf16 conv compute is the AMP-equivalent the reference
    # gets from torch autocast. Eval metrics keep fp32 LPIPS.
    lpips_bf16: bool = True
    # bf16 activations/conv compute for the RQ-VAE fwd/bwd itself (params,
    # optimizer, codebook EMA state and all losses stay fp32; GroupNorm
    # stats are fp32 inside the modules; quantizer distances promote to
    # fp32 against the fp32 codebook). Default OFF: the reference trains
    # the VQGAN fp32 and adversarial training is the numerically
    # touchiest loop in the framework — this is an opt-in throughput
    # mode, validated by the convergence harness (AMP_S1=1
    # tools/train_convergence.py).
    amp_bf16: bool = False


def init_state(
    rng: jax.Array,
    model: RQVAE,
    disc: NLayerDiscriminator,
    tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    image_shape=(256, 256, 3),
    use_ema: bool = False,
) -> Stage1State:
    r1, r2, r3 = jax.random.split(rng, 3)

    # jit the inits: one compiled program instead of hundreds of small RNG
    # dispatches (critical on remote-tunnel TPU backends)
    @jax.jit
    def _init(r1, r2, r3):
        x0 = jnp.zeros((1, *image_shape))
        return (
            model.init({"params": r1, "quantizer": r2}, x0),
            disc.init(r3, x0, train=True),
        )

    variables, disc_vars = _init(r1, r2, r3)
    params = variables["params"]
    return Stage1State(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        codebook=variables["codebook"],
        disc_params=disc_vars["params"],
        disc_opt_state=disc_tx.init(disc_vars["params"]),
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        disc_step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        ema_codebook=jax.tree.map(jnp.copy, variables["codebook"]) if use_ema else None,
    )


def make_train_step(
    model: RQVAE,
    disc: NLayerDiscriminator,
    lpips: LPIPS,
    lpips_vars: dict,
    gan_cfg: GanLossConfig,
    tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    use_discriminator: bool,  # epoch >= disc_start (static: jit both variants)
    ema_mu: float = 0.9999,
):
    d_loss_fn = gan_losses.D_LOSSES[gan_cfg.disc_loss]
    g_loss_fn = gan_losses.G_LOSSES[gan_cfg.gen_loss]
    p_weight = gan_cfg.perceptual_weight
    if gan_cfg.lpips_bf16 and lpips.dtype is None:
        lpips = type(lpips)(dtype=jnp.bfloat16)  # same params, bf16 compute

    from rqvae_tpu.models.rqvae.modules import decoder_tail

    def disc_apply(disc_params, batch_stats, x, update_stats: bool):
        variables = {"params": disc_params, "batch_stats": batch_stats}
        # train=True normalizes with batch statistics (torch train-mode BN);
        # the running-stat write is kept only for the discriminator's own step
        logits, mutated = disc.apply(variables, x, train=True, mutable=["batch_stats"])
        return logits, (mutated["batch_stats"] if update_stats else batch_stats)

    def recon_loss(out, xs):
        if model.hparams.loss_type == "mse":
            return jnp.mean(jnp.square(out - xs))
        return jnp.mean(jnp.abs(out - xs))

    def train_step(
        state: Stage1State, batch: dict, rng: jax.Array, lpips_vars=lpips_vars
    ):
        # `lpips_vars` defaults to the build-time weights (closure constants,
        # convenient for the library loop) but can be passed as a CALL arg so
        # the ~55 MB VGG tower rides the jit argument path instead of the HLO
        # constant pool — the remote-compile tunnel rejects big constant
        # payloads at bs >= 64 (same fix as make_frozen_encode_fn(as_args=True)).
        xs = batch["images"]
        rng = jax.random.fold_in(rng, state.step)
        out_ch = xs.shape[-1]

        def total_gen(params):
            """ONE full forward; the adaptive weight's two extra gradients
            only traverse the decoder tail + losses (AD-pruned exactly like
            the reference's autograd.grad(nll/g, last_layer),
            trainer_rqvae.py:31-37)."""
            if gan_cfg.amp_bf16:
                def _cast(t):
                    return (
                        t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t
                    )

                params_c = jax.tree.map(_cast, params)
                xs_in = xs.astype(jnp.bfloat16)
            else:
                params_c, xs_in = params, xs
            (h_pre, quant_loss, codes), mutated = model.apply(
                {"params": params_c, "codebook": state.codebook},
                xs_in,
                training=True,
                method=type(model).forward_pre,
                rngs={"quantizer": rng, "dropout": jax.random.fold_in(rng, 1)},
                mutable=["codebook"],
            )
            dec_params = params_c["decoder"]
            out = decoder_tail(dec_params, h_pre, out_ch)

            loss_recon = recon_loss(out, xs)
            loss_latent = quant_loss
            loss_rec_lat = (
                loss_recon + model.hparams.latent_loss_weight * loss_latent
            )
            # perceptual_weight == 0 statically skips the whole VGG16 tower
            # (forward AND its grads) instead of multiplying it by zero
            loss_pcpt = (
                lpips.apply(lpips_vars, xs, out) if p_weight else jnp.zeros(())
            )

            if use_discriminator:
                logits_fake, _ = disc_apply(
                    state.disc_params, state.disc_batch_stats, out, False
                )
                loss_gen = g_loss_fn(logits_fake)

                # adaptive weight: tail-only jacobians under stop_gradient
                h_sg = jax.lax.stop_gradient(h_pre)
                dec_sg = jax.lax.stop_gradient(dec_params)

                def split_losses(last_kernel):
                    dp = dict(dec_sg)
                    dp["conv_out"] = dict(dp["conv_out"])
                    dp["conv_out"]["kernel"] = last_kernel
                    out_t = decoder_tail(dp, h_sg, out_ch)
                    nll = recon_loss(out_t, xs)
                    if p_weight:
                        nll = nll + p_weight * lpips.apply(lpips_vars, xs, out_t)
                    lf, _ = disc_apply(
                        state.disc_params, state.disc_batch_stats, out_t, False
                    )
                    return jnp.stack([nll, g_loss_fn(lf)])

                jac = jax.jacrev(split_losses)(
                    jax.lax.stop_gradient(dec_params["conv_out"]["kernel"])
                )
                nll_norm = jnp.linalg.norm(jac[0].reshape(-1).astype(jnp.float32))
                g_norm = jnp.linalg.norm(jac[1].reshape(-1).astype(jnp.float32))
                g_weight = jax.lax.stop_gradient(
                    jnp.clip(nll_norm / (g_norm + 1e-4), 0.0, 1e4)
                )
            else:
                loss_gen = jnp.zeros(())
                g_weight = jnp.zeros(())

            total = (
                loss_rec_lat
                + p_weight * loss_pcpt
                + g_weight * gan_cfg.disc_weight * loss_gen
            )
            aux = {
                "out": out,
                "codes": codes,
                "new_codebook": mutated["codebook"],
                "loss_recon": loss_recon,
                "loss_latent": loss_latent,
                "loss_pcpt": loss_pcpt,
                "loss_gen": loss_gen,
                "g_weight": g_weight,
            }
            return total, aux

        (loss_gen_total, aux), grads = jax.value_and_grad(total_gen, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # discriminator step (reference trainer_rqvae.py:267-273)
        out_detached = jax.lax.stop_gradient(aux["out"])
        if use_discriminator:
            def disc_loss_fn(disc_params):
                logits_fake, bs1 = disc_apply(
                    disc_params, state.disc_batch_stats, out_detached, True
                )
                logits_real, bs2 = disc_apply(disc_params, bs1, xs, True)
                loss_disc = d_loss_fn(logits_real, logits_fake)
                return gan_cfg.disc_weight * loss_disc, (
                    loss_disc, logits_real, logits_fake, bs2,
                )

            (_, (loss_disc, logits_real, logits_fake, new_bs)), d_grads = (
                jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params)
            )
            d_updates, disc_opt_state = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            disc_step = state.disc_step + 1
            logits_avg = {
                "logits_real": jnp.mean(logits_real),
                "logits_fake": jnp.mean(logits_fake),
            }
        else:
            loss_disc = jnp.zeros(())
            disc_params, disc_opt_state = state.disc_params, state.disc_opt_state
            new_bs = state.disc_batch_stats
            disc_step = state.disc_step
            logits_avg = {"logits_real": jnp.zeros(()), "logits_fake": jnp.zeros(())}

        ema_params = state.ema_params
        ema_codebook = state.ema_codebook
        if ema_params is not None:
            ema_params = ema_lib.ema_update(ema_params, params, state.step, ema_mu)
            ema_codebook = ema_lib.ema_update(
                ema_codebook, aux["new_codebook"], state.step, ema_mu
            )

        metrics = {
            "loss_total": aux["loss_recon"]
            + model.hparams.latent_loss_weight * aux["loss_latent"]
            + p_weight * aux["loss_pcpt"],
            "loss_recon": aux["loss_recon"],
            "loss_latent": aux["loss_latent"],
            "loss_pcpt": aux["loss_pcpt"],
            "loss_gen": aux["loss_gen"],
            "loss_disc": loss_disc,
            "g_weight": aux["g_weight"],
            **logits_avg,
        }
        new_state = Stage1State(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            codebook=aux["new_codebook"],
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
            disc_batch_stats=new_bs,
            disc_step=disc_step,
            ema_params=ema_params,
            ema_codebook=ema_codebook,
        )
        return new_state, metrics, aux["codes"]

    return train_step


def make_eval_step(
    model: RQVAE,
    disc: NLayerDiscriminator,
    lpips: LPIPS,
    lpips_vars: dict,
    gan_cfg: GanLossConfig,
    *,
    use_discriminator: bool,
    use_ema: bool = False,
):
    """Eval step with the reference's batch-size-scaled sums
    (trainer_rqvae.py:137-218: valid=True scales recon by B*C, latent by B,
    pcpt/gen/disc by B)."""
    d_loss_fn = gan_losses.D_LOSSES[gan_cfg.disc_loss]
    g_loss_fn = gan_losses.G_LOSSES[gan_cfg.gen_loss]
    p_weight = gan_cfg.perceptual_weight

    def eval_step(state: Stage1State, batch: dict):
        xs = batch["images"]
        params = state.ema_params if use_ema else state.params
        codebook = (
            state.ema_codebook
            if (use_ema and state.ema_codebook is not None)
            else state.codebook
        )
        out, quant_loss, codes = model.apply(
            {"params": params, "codebook": codebook}, xs
        )
        losses = model.compute_loss(out, quant_loss, codes, xs=xs, valid=True)
        loss_pcpt = lpips.apply(lpips_vars, xs, out) * xs.shape[0]

        if use_discriminator:
            variables = {"params": state.disc_params, "batch_stats": state.disc_batch_stats}
            logits_fake = disc.apply(variables, out, train=False)
            logits_real = disc.apply(variables, xs, train=False)
            loss_gen = g_loss_fn(logits_fake) * xs.shape[0]
            loss_disc = d_loss_fn(logits_real, logits_fake) * xs.shape[0]
            logits = {
                "logits_real": jnp.mean(logits_real) * xs.shape[0],
                "logits_fake": jnp.mean(logits_fake) * xs.shape[0],
            }
        else:
            loss_gen = loss_disc = jnp.zeros(())
            logits = {"logits_real": jnp.zeros(()), "logits_fake": jnp.zeros(())}

        metrics = {
            "loss_total": losses["loss_total"] + p_weight * loss_pcpt,
            "loss_recon": losses["loss_recon"],
            "loss_latent": losses["loss_latent"],
            "loss_pcpt": loss_pcpt,
            "loss_gen": loss_gen,
            "loss_disc": loss_disc,
            **logits,
        }
        return metrics, codes

    return eval_step
