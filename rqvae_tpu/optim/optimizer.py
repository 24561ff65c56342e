"""Optimizer factory on optax.

Mirrors the reference routes (/root/reference/rqvae/optimizer/optimizer.py:
17-43): adamW / adam / SGD with config betas/weight_decay, plus the
global-norm clip `max_gn` the reference parses but never wires up
(utils/config.py:56 — implemented here for the stage-2 trainer).
"""

from __future__ import annotations

from typing import Callable, Optional

import optax


def create_optimizer(
    optim_config,
    schedule: Callable,
) -> optax.GradientTransformation:
    opt_type = optim_config["type"].lower()
    betas = tuple(optim_config.get("betas", (0.9, 0.999)))
    wd = float(optim_config.get("weight_decay", 0.0))
    max_gn = optim_config.get("max_gn", None)

    if opt_type == "adamw":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif opt_type == "adam":
        # torch Adam applies weight decay as L2 into the gradient
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(schedule, b1=betas[0], b2=betas[1]),
        )
    elif opt_type == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule, momentum=optim_config.get("momentum", 0.9)),
        )
    else:
        raise ValueError(f"{opt_type} invalid")

    if max_gn is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(max_gn)), tx)
    return tx
