"""Hierarchical YAML config system.

TPU-native re-implementation of the reference config layer
(/root/reference/rqvae/utils/config.py:17-162). The reference stacks
easydict + OmegaConf; here a single lightweight attr-dict (`Config`) provides
the same surface: YAML load, recursive merge, dotlist CLI overrides, and the
layered default augmentation (`augment_defaults`, `augment_dist_defaults`)
so that the reference's YAML files under configs/ load unmodified.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Iterable, Mapping

import yaml


def env_flag(name: str, default: bool = False) -> bool:
    """Boolean env var: '0', 'false', 'no', '' are False (bool(os.environ
    .get(...)) treats the string '0' as True — a footgun for SMOKE_TEST=0)."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() not in ("", "0", "false", "no", "off")


class Config(dict):
    """dict with attribute access and recursive wrapping."""

    def __init__(self, data: Mapping | None = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for k, v in data.items():
            self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return [Config._wrap(v) for v in value]
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        del self[key]

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def copy(self) -> "Config":
        return copy.deepcopy(self)

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def merge(base: Mapping, override: Mapping) -> Config:
    """Recursive merge; `override` wins. Lists are replaced, not concatenated
    (matches OmegaConf.merge semantics used by the reference)."""
    out = Config(base).copy()
    for k, v in override.items():
        if k in out and isinstance(out[k], Config) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(text: str):
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def from_dotlist(items: Iterable[str]) -> Config:
    """'a.b.c=1 x=[2,3]' style overrides (OmegaConf.from_dotlist equivalent)."""
    cfg = Config()
    for item in items:
        if "=" not in item:
            raise ValueError(f"dotlist entry must be key=value, got {item!r}")
        key, value = item.split("=", 1)
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], Config):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = _parse_value(value)
    return cfg


def load_config(config_path: str) -> Config:
    with open(config_path) as f:
        return Config(yaml.safe_load(f) or {})


def is_stage1_arch(arch_type: str) -> bool:
    return "transformer" not in arch_type


# ---------------------------------------------------------------------------
# layered defaults (reference rqvae/utils/config.py:29-129)
# ---------------------------------------------------------------------------

RQVAE_ARCH_DEFAULTS = {
    "ema": None,
    "hparams": {
        "loss_type": "l1",
        "restart_unused_codes": False,
        "use_padding_idx": False,
        "masked_dropout": 0.0,
    },
    "checkpointing": False,
}

ATTENTION_BLOCK_DEFAULTS = {
    "embed_dim": None,
    "n_head": None,
    "mlp_bias": True,
    "attn_bias": True,
    "attn_pdrop": 0.0,
    "resid_pdrop": 0.1,
    "gelu": "v1",
}

RQTRANSFORMER_DEFAULTS = {
    "type": "rq-transformer",
    "ema": None,
    "ar_hierarchy": None,
    "vocab_size": None,
    "block_size": None,
    "vocab_size_cond": 0,
    "block_size_cond": 0,
    "embed_dim": None,
    "input_embed_dim": None,
    "use_padding_emb": False,
    "input_emb_vqvae": False,
    "head_emb_vqvae": False,
    "scaled_head_emb_vqvae": False,
    "cumsum_depth_ctx": False,
    "shared_tok_emb": False,
    "embd_pdrop": 0.0,
    "body": {"n_layer": None, "block": ATTENTION_BLOCK_DEFAULTS},
    "head": {"n_layer": None, "block": ATTENTION_BLOCK_DEFAULTS},
    "shared_cls_emb": False,
}


def augment_arch_defaults(arch_config: Config) -> Config:
    if arch_config.type == "rq-vae":
        return merge(RQVAE_ARCH_DEFAULTS, arch_config)
    elif arch_config.type == "rq-transformer":
        defaults = Config(RQTRANSFORMER_DEFAULTS).copy()
        # propagate embed_dim into body/head blocks
        # (reference configs.py:68-73 RQTransformerConfig.create)
        defaults.body.block.embed_dim = arch_config.embed_dim
        defaults.head.block.embed_dim = arch_config.embed_dim
        return merge(defaults, arch_config)
    else:
        raise NotImplementedError(arch_config.type)


def augment_optimizer_defaults(optim_config: Config) -> Config:
    defaults = {
        "type": "adamW",
        "max_gn": None,
        "warmup": {
            "mode": "linear",
            "start_from_zero": bool(optim_config.warmup.epoch > 0),
        },
    }
    return merge(defaults, optim_config)


def augment_defaults(config: Config) -> Config:
    defaults = Config(
        {
            "arch": augment_arch_defaults(config.arch),
            "dataset": {"transform": {"type": None}},
            "optimizer": augment_optimizer_defaults(config.optimizer),
            "experiment": {"test_freq": 10, "amp": False},
        }
    )

    if "gan" in config:
        gan_opt = merge(defaults.optimizer, config.gan.disc.get("optimizer", {}))
        defaults.gan = Config({"disc": {"optimizer": gan_opt}})

    if not is_stage1_arch(config.arch.type):
        # stage-2: pull the stage-1 arch config from the vqvae ckpt directory
        # (reference config.py:91-107)
        model_aux_path = config.vqvae.ckpt
        model_aux_config_path = os.path.join(
            os.path.dirname(model_aux_path), "config.yaml"
        )
        stage1_arch_config = load_config(model_aux_config_path).arch

        config = config.copy()
        config.vqvae = stage1_arch_config
        config.vqvae.ckpt = model_aux_path

        defaults.vqvae = augment_arch_defaults(config.vqvae)
        defaults.arch.vocab_size = config.dataset.vocab_size
        defaults.experiment.sample = {"top_k": None, "top_p": None}

        if config.get("loss", {}).get("type", "") == "soft_target_cross_entropy":
            defaults.loss = {"temp": 1.0, "stochastic_codes": False}
        else:
            defaults.loss = {
                "type": "cross_entropy",
                "temp": 1.0,
                "stochastic_codes": False,
            }

    return merge(defaults, config)


def augment_dist_defaults(config: Config, num_devices: int) -> Config:
    """Gradient-accumulation math (reference config.py:114-129).

    `num_devices` plays the role of world_size; with single-controller JAX the
    per-device batch is config.experiment.batch_size.
    """
    config = config.copy()

    local_batch_size = config.experiment.batch_size
    world_batch_size = num_devices * local_batch_size
    total_batch_size = config.experiment.get("total_batch_size", world_batch_size)

    if total_batch_size % world_batch_size != 0:
        raise ValueError("total batch size must be divisible by world batch size")
    grad_accm_steps = total_batch_size // world_batch_size

    config.optimizer.grad_accm_steps = grad_accm_steps
    config.experiment.total_batch_size = total_batch_size
    return config


def config_setup(args, num_devices: int, config_path: str, extra_args=()) -> Config:
    """Mirror of reference config_setup (config.py:132-162) for train/eval/resume."""
    if getattr(args, "eval", False):
        config = load_config(config_path)
        config = augment_defaults(config)
        if hasattr(args, "test_batch_size") and args.test_batch_size:
            config.experiment.batch_size = args.test_batch_size
        if "seed" not in config:
            config.seed = args.seed
    elif getattr(args, "resume", False):
        config = load_config(config_path)
        if num_devices != config.runtime.num_devices:
            raise ValueError("num_devices not identical to the resuming config")
        config.runtime = {"args": vars(args), "num_devices": num_devices}
    else:
        config = load_config(getattr(args, "model_config", config_path))
        config = merge(config, from_dotlist(extra_args))
        config = augment_defaults(config)
        config = augment_dist_defaults(config, num_devices)
        config.seed = args.seed
        config.runtime = {
            "args": vars(args),
            "extra_config": from_dotlist(extra_args),
            "num_devices": num_devices,
        }
    return config
