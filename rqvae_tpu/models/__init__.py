"""Model factory + checkpoint-aware loading.

Mirrors the reference create_model dispatch
(/root/reference/rqvae/models/__init__.py:20-37). Stage-1 RQ-VAE is a flax
module; stage-2 RQ-Transformer is a functional (config, params) pair.
`load_model` accepts either a reference torch .pt checkpoint (converted on
the fly) or a native Orbax directory.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rqvae_tpu.models.rqtransformer import model as rqt
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.models.rqvae.model import RQVAE, RQVAEHParams
from rqvae_tpu.models.rqvae.modules import DDConfig


def create_model(arch_config, ema: bool = False):
    """Reference-compatible dispatch (models/__init__.py:20-37): returns
    (model, ema_model_or_None). Stage-1 -> (RQVAE flax module, None|"ema"
    marker: EMA params live in the trainer state); stage-2 ->
    (TransformerConfig, ...) since the transformer is functional."""
    if arch_config["type"] == "rq-vae":
        model = create_rqvae(arch_config)
        return model, (model if ema else None)
    elif arch_config["type"] == "rq-transformer":
        config = create_rqtransformer(arch_config)
        return config, (config if ema else None)
    raise ValueError(f"{arch_config['type']} is not supported")


def create_rqvae(arch_config, use_kernel: Optional[bool] = None) -> RQVAE:
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    return RQVAE(
        hparams=RQVAEHParams.create(arch_config["hparams"]),
        ddconfig=DDConfig.create(arch_config["ddconfig"]),
        checkpointing=arch_config.get("checkpointing", False),
        use_kernel=use_kernel,
    )


def create_rqtransformer(arch_config) -> TransformerConfig:
    return TransformerConfig.create(arch_config)


def init_rqvae_variables(model: RQVAE, rng, image_size: int) -> dict:
    x0 = jnp.zeros((1, image_size, image_size, 3))
    r1, r2 = jax.random.split(rng)
    return model.init({"params": r1, "quantizer": r2}, x0)


def load_rqvae(arch_config, ckpt_path: str, use_kernel=None) -> Tuple[RQVAE, dict]:
    """(model, variables) from a reference .pt or native ckpt."""
    model = create_rqvae(arch_config, use_kernel)
    if ckpt_path.endswith((".pt", ".pth", ".ckpt")):
        from rqvae_tpu.checkpoint.torch_convert import (
            convert_rqvae,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(ckpt_path)
        params, codebook = convert_rqvae(sd, model.quantizer_config)
        params = jax.tree.map(jnp.asarray, params)
        variables = {"params": params, "codebook": {"state": codebook}}
    else:
        # native Orbax weights dir: .../ckpt/step_N holding
        # {"params": ..., "codebook": ...} (see save_checkpoint)
        from rqvae_tpu.checkpoint import restore_checkpoint

        res = arch_config["ddconfig"]["resolution"]
        target = init_rqvae_variables(model, jax.random.PRNGKey(0), res)
        ckpt_dir, step = os.path.split(os.path.normpath(ckpt_path))
        restored = restore_checkpoint(ckpt_dir, dict(target), int(step.split("_")[1]))
        variables = {"params": restored["params"], "codebook": restored["codebook"]}
    return model, variables


def load_rqtransformer(
    arch_config, ckpt_path: str, use_ema: bool = False
) -> Tuple[TransformerConfig, dict]:
    """(config, params) from a reference .pt or native Orbax state.

    use_ema selects the EMA weights (reference loads state_dict_ema when
    sampling EMA-trained models, main_sampling_fid.py:146-156)."""
    config = create_rqtransformer(arch_config)
    if ckpt_path.endswith((".pt", ".pth", ".ckpt")):
        from rqvae_tpu.checkpoint.torch_convert import (
            convert_rqtransformer,
            load_torch_state_dict,
        )

        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        key = "state_dict_ema" if (use_ema and "state_dict_ema" in ckpt) else None
        if key:
            sd = {k: v.detach().cpu().numpy() for k, v in ckpt[key].items()}
        else:
            if use_ema:
                raise ValueError(f"no state_dict_ema in {ckpt_path}")
            sd = load_torch_state_dict(ckpt_path)
        params = jax.tree.map(jnp.asarray, convert_rqtransformer(sd, config))
    else:
        from rqvae_tpu.checkpoint import restore_checkpoint

        target = rqt.init_transformer_params(jax.random.PRNGKey(0), config)
        ckpt_dir, step = os.path.split(os.path.normpath(ckpt_path))
        step_n = int(step.split("_")[1])
        try:  # weights saved with EMA params alongside
            state = restore_checkpoint(
                ckpt_dir, {"params": target, "ema_params": target}, step_n
            )
        except Exception:
            if use_ema:
                raise
            state = restore_checkpoint(ckpt_dir, {"params": target}, step_n)
        params = state["ema_params"] if (use_ema and "ema_params" in state) else state["params"]
        if use_ema and "ema_params" not in state:
            raise ValueError(f"no ema_params in {ckpt_path}")
    return config, params
