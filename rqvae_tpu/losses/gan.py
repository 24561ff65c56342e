"""GAN losses (reference /root/reference/rqvae/losses/vqgan/gan_loss.py:7-27)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def vanilla_g_loss(logits_fake):
    return -jnp.mean(logits_fake)


D_LOSSES = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss}
G_LOSSES = {"vanilla": vanilla_g_loss}
