"""RQ-VAE: conv encoder -> residual-quantization bottleneck -> conv decoder.

TPU-native re-design of the reference RQVAE
(/root/reference/rqvae/models/rqvae/rqvae.py:26-168). The codebook + EMA
statistics live in a dedicated flax variable collection ("codebook") so the
training step applies the model with mutable=["codebook"] and the EMA update
happens inside the jitted step (psum-reduced across the data mesh axis),
replacing the reference's buffer mutation + dist.all_reduce.

Inputs/outputs are NHWC in [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rqvae_tpu.models.rqvae.modules import DDConfig, Decoder, Encoder
from rqvae_tpu.ops import quantize as rq


@dataclasses.dataclass(frozen=True)
class RQVAEHParams:
    embed_dim: int = 64
    n_embed: object = 512  # int or per-depth list
    decay: object = 0.99
    loss_type: str = "mse"
    latent_loss_weight: float = 0.25
    bottleneck_type: str = "rq"
    latent_shape: tuple = ()
    code_shape: tuple = ()
    shared_codebook: bool = False
    restart_unused_codes: bool = True

    @staticmethod
    def create(cfg) -> "RQVAEHParams":
        return RQVAEHParams(
            embed_dim=cfg["embed_dim"],
            n_embed=cfg["n_embed"],
            decay=cfg.get("decay", 0.99),
            loss_type=cfg.get("loss_type", "l1"),
            latent_loss_weight=cfg.get("latent_loss_weight", 0.25),
            bottleneck_type=cfg.get("bottleneck_type", "rq"),
            latent_shape=tuple(cfg["latent_shape"]),
            code_shape=tuple(cfg["code_shape"]),
            shared_codebook=cfg.get("shared_codebook", False),
            restart_unused_codes=cfg.get("restart_unused_codes", True),
        )


class RQVAE(nn.Module):
    hparams: RQVAEHParams
    ddconfig: DDConfig
    checkpointing: bool = False
    axis_name: Optional[str] = None  # data-mesh axis for EMA psum
    use_kernel: bool = True

    @property
    def quantizer_config(self) -> rq.QuantizerConfig:
        hp = self.hparams
        assert hp.bottleneck_type == "rq", "only 'rq' bottleneck is supported"
        n_embed = list(hp.n_embed) if isinstance(hp.n_embed, (list, tuple)) else hp.n_embed
        decay = list(hp.decay) if isinstance(hp.decay, (list, tuple)) else hp.decay
        return rq.QuantizerConfig.create(
            latent_shape=hp.latent_shape,
            code_shape=hp.code_shape,
            n_embed=n_embed,
            decay=decay,
            shared_codebook=hp.shared_codebook,
            restart_unused_codes=hp.restart_unused_codes,
        )

    def setup(self):
        self.encoder = Encoder(self.ddconfig, checkpointing=self.checkpointing)
        self.decoder = Decoder(self.ddconfig, checkpointing=self.checkpointing)
        self.quant_conv = nn.Conv(self.hparams.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.ddconfig.z_channels, (1, 1), name="post_quant_conv"
        )
        qcfg = self.quantizer_config
        self.codebook = self.variable(
            "codebook",
            "state",
            lambda: rq.init_codebook_state(self.make_rng("params"), qcfg),
        )

    # ---- core paths ------------------------------------------------------

    def encode(self, xs, deterministic: bool = True):
        z_e = self.encoder(xs, deterministic)
        return self.quant_conv(z_e)  # already NHWC

    def decode(self, z_q, deterministic: bool = True):
        z = self.post_quant_conv(z_q)
        return self.decoder(z, deterministic)

    def __call__(self, xs, training: bool = False):
        z_q, quant_loss, codes = self._encode_quantize(xs, training)
        out = self.decode(z_q, deterministic=not training)
        return out, quant_loss, codes

    def _encode_quantize(self, xs, training: bool):
        z_e = self.encode(xs, deterministic=not training)
        rng = self.make_rng("quantizer") if (
            training and self.hparams.restart_unused_codes
        ) else None
        z_q, quant_loss, codes, new_state = rq.rq_bottleneck_forward(
            z_e,
            self.codebook.value,
            self.quantizer_config,
            training=training,
            rng=rng,
            axis_name=self.axis_name if training else None,
            use_kernel=self.use_kernel,
        )
        if training and not self.is_initializing():
            self.codebook.value = new_state
        return z_q, quant_loss, codes

    def forward_pre(self, xs, training: bool = False):
        """Forward stopping BEFORE the decoder's final norm/act/conv
        (reference give_pre_end, modules.py:196-197). The trainer finishes
        with modules.decoder_tail so the adaptive-GAN-weight grads only
        traverse the tail."""
        z_q, quant_loss, codes = self._encode_quantize(xs, training)
        z = self.post_quant_conv(z_q)
        h_pre = self.decoder(z, not training, True)  # give_pre_end
        return h_pre, quant_loss, codes

    # ---- auxiliary APIs (reference rqvae.py:91-168) ----------------------

    def get_codes(self, xs):
        z_e = self.encode(xs)
        _, codes = rq.quantize(
            rq.to_code_shape(z_e, self.quantizer_config),
            self.codebook.value,
            self.quantizer_config,
            use_kernel=self.use_kernel,
        )
        return codes

    def get_soft_codes(self, xs, temp: float = 1.0, stochastic: bool = False):
        z_e = self.encode(xs)
        rng = self.make_rng("soft_codes") if stochastic else None
        return rq.get_soft_codes(
            z_e, self.codebook.value, self.quantizer_config, temp, stochastic, rng
        )

    def decode_code(self, codes):
        z_q = rq.embed_code(codes, self.codebook.value, self.quantizer_config)
        return self.decode(z_q)

    def get_code_emb_with_depth(self, codes):
        return rq.embed_code_with_depth(
            codes, self.codebook.value, self.quantizer_config
        )

    def decode_partial_code(self, codes, code_idx: int, decode_type: str = "select"):
        z_q = rq.embed_partial_code(
            codes, code_idx, self.codebook.value, self.quantizer_config, decode_type
        )
        return self.decode(z_q)

    def forward_partial_code(self, xs, code_idx: int, decode_type: str = "select"):
        codes = self.get_codes(xs)
        return self.decode_partial_code(codes, code_idx, decode_type)

    # ---- losses / helpers -------------------------------------------------

    @staticmethod
    def get_recon_imgs(xs_real, xs_recon):
        xs_real = xs_real * 0.5 + 0.5
        xs_recon = jnp.clip(xs_recon * 0.5 + 0.5, 0.0, 1.0)
        return xs_real, xs_recon

    def compute_loss(self, out, quant_loss, codes, xs, valid: bool = False):
        if self.hparams.loss_type == "mse":
            loss_recon = jnp.mean(jnp.square(out - xs))
        elif self.hparams.loss_type == "l1":
            loss_recon = jnp.mean(jnp.abs(out - xs))
        else:
            raise ValueError("incompatible loss type")

        loss_latent = quant_loss
        if valid:
            # batch-size/channel scaled sums for eval accumulation
            # (reference rqvae.py:130-132)
            loss_recon = loss_recon * xs.shape[0] * xs.shape[-1]
            loss_latent = loss_latent * xs.shape[0]

        loss_total = loss_recon + self.hparams.latent_loss_weight * loss_latent
        return {
            "loss_total": loss_total,
            "loss_recon": loss_recon,
            "loss_latent": loss_latent,
            "codes": [codes],
        }

