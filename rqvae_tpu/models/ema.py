"""Exponential moving average of a parameter pytree.

Matches reference ExponentialMovingAverage semantics
(/root/reference/rqvae/models/ema.py:31-48): warmup decay
min(mu, (1 + step) / (10 + step)) applied state-entry-wise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, new_params, step, mu: float = 0.9999):
    decay = jnp.minimum(mu, (1.0 + step) / (10.0 + step))
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
