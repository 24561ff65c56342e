"""Shared CLI helpers: model-pair loading from a checkpoint directory
(reference main_sampling_fid.py:146-158 load_model) and seeding."""

from __future__ import annotations

import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RQVAE_TPU_CPU"):
    # force-CPU knob for tests/CI subprocesses: the container pins the TPU
    # backend via jax.config.update, which ignores JAX_PLATFORMS (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

from rqvae_tpu.models import load_rqtransformer, load_rqvae  # noqa: E402
from rqvae_tpu.utils.config import augment_arch_defaults, load_config  # noqa: E402


def set_seed(seed=None) -> int:
    if seed is None:
        seed = random.getrandbits(32)
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return seed


def load_model_from_ckpt(ckpt_path: str, use_ema: bool = False):
    """Load a model (+config) given a .pt/Orbax path with config.yaml beside
    it. Returns ('rq-vae', model, variables, config) or
    ('rq-transformer', tconf, params, config)."""
    config_path = os.path.join(os.path.dirname(ckpt_path), "config.yaml")
    config = load_config(config_path)
    arch = augment_arch_defaults(config.arch)
    if arch.type == "rq-vae":
        model, variables = load_rqvae(arch, ckpt_path)
        return "rq-vae", model, variables, config
    elif arch.type == "rq-transformer":
        tconf, params = load_rqtransformer(arch, ckpt_path, use_ema=use_ema)
        return "rq-transformer", tconf, params, config
    raise ValueError(arch.type)


def load_ar_and_vqvae(ar_ckpt_path: str, use_ema: bool = False):
    """(tconf, ar_params, vqvae_model, vq_vars, stage2_config); the stage-1
    checkpoint path comes from the stage-2 config (config.vqvae.ckpt)."""
    kind, tconf, params, config = load_model_from_ckpt(ar_ckpt_path, use_ema=use_ema)
    assert kind == "rq-transformer", "expected a stage-2 checkpoint"
    vq_ckpt = config.vqvae.ckpt
    vq_config_path = os.path.join(os.path.dirname(vq_ckpt), "config.yaml")
    vq_arch = augment_arch_defaults(load_config(vq_config_path).arch)
    vqvae, vq_vars = load_rqvae(vq_arch, vq_ckpt)
    return tconf, params, vqvae, vq_vars, config
