"""LR schedule: GradualWarmup (+buffer) then cosine annealing.

Functional re-implementation of the reference scheduler semantics
(/root/reference/rqvae/optimizer/scheduler.py:20-109): linear warmup to
`multiplier * base_lr` (from zero or from base_lr), an optional buffer hold,
then CosineAnnealingLR from base_lr down to min_lr over the remaining steps.
The multiplier scales with world size per the warmup `mode`
(linear/sqrt/fix/none, scheduler.py:36-43). Stepped PER ITERATION (the
reference calls scheduler.step() every iteration, trainer_rqvae.py:264).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def warmup_multiplier(mode: str, multiplier: float, world_size: int) -> float:
    if mode == "linear":
        return max(1.0, multiplier * world_size)
    if mode == "sqrt":
        return max(1.0, multiplier * math.sqrt(world_size))
    if mode == "fix":
        return max(1.0, multiplier)
    if mode == "none":
        return multiplier
    raise NotImplementedError(f"{mode} is not a valid warmup policy")


def create_schedule(
    *,
    base_lr: float,
    warmup_config,
    steps_per_epoch: int,
    max_epoch: float,
    world_size: int = 1,
):
    """Returns step -> lr (works on traced int32 steps)."""
    warmup_steps = int(warmup_config["epoch"] * steps_per_epoch)
    buffer_steps = int(warmup_config.get("buffer_epoch", 0) * steps_per_epoch)
    final_steps = int(max_epoch * steps_per_epoch)
    min_lr = float(warmup_config.get("min_lr", 0.0))
    mode = warmup_config.get("mode", "linear")
    start_from_zero = bool(warmup_config.get("start_from_zero", warmup_steps > 0))
    multiplier = (
        warmup_multiplier(mode, float(warmup_config.get("multiplier", 1)), world_size)
        if warmup_steps > 0
        else 1.0
    )
    t_max = max(final_steps - warmup_steps - buffer_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(1.0, step / max(warmup_steps, 1))
        if start_from_zero:
            warm_lr = base_lr * multiplier * frac
        else:
            warm_lr = base_lr * (1.0 + (multiplier - 1.0) * frac)

        cos_step = jnp.clip(step - warmup_steps - buffer_steps, 0, t_max)
        cos_lr = min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * cos_step / t_max)
        )

        if warmup_steps > 0:
            in_warm = step <= (warmup_steps + buffer_steps)
            hold = jnp.where(step > warmup_steps, base_lr * multiplier, warm_lr)
            return jnp.where(in_warm, hold, cos_lr)
        return cos_lr

    return schedule
