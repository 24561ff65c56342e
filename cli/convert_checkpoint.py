"""Convert checkpoints between the reference torch format and native Orbax.

Forward (default): reference .pt -> Orbax pytree (the sampling/eval CLIs
also load .pt directly; this materializes the conversion for faster repeated
loading and torch-free environments).

Reverse (--to-torch): a checkpoint trained HERE (Orbax or .pt) -> a
reference-format .pt loadable by /root/reference's torch implementation
(round-trip bit-exactness asserted in tests/test_torch_export.py).

Usage:
  python cli/convert_checkpoint.py -m <ckpt.pt> -o <out_dir> [--ema]
  python cli/convert_checkpoint.py -m <ckpt> -o <out_dir> --to-torch
  (config.yaml must sit beside the checkpoint, as in the reference releases)
"""

from __future__ import annotations

import argparse
import os
import shutil

from common import load_model_from_ckpt

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", required=True)
    p.add_argument("-o", "--out-dir", required=True)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--to-torch", action="store_true",
                   help="export a reference-format .pt instead of Orbax")
    args = p.parse_args()

    from rqvae_tpu.checkpoint import save_checkpoint

    if args.to_torch:
        return main_to_torch(args)

    kind, model_or_conf, vars_or_params, config = load_model_from_ckpt(
        args.model_path, use_ema=args.ema
    )
    if kind == "rq-vae":
        weights = {
            "params": vars_or_params["params"],
            "codebook": vars_or_params["codebook"],
        }
    else:
        weights = {"params": vars_or_params}

    os.makedirs(args.out_dir, exist_ok=True)
    path = save_checkpoint(args.out_dir, jax.device_get(weights), 0)
    src_cfg = os.path.join(os.path.dirname(args.model_path), "config.yaml")
    shutil.copy(src_cfg, os.path.join(args.out_dir, "config.yaml"))
    n = sum(x.size for x in jax.tree.leaves(weights)) / 1e6
    print(f"converted {kind} ({n:.1f}M params) -> {path}")
    print(f"load with: -m {path}")


def main_to_torch(args):
    from rqvae_tpu.checkpoint.torch_export import (
        export_rqtransformer,
        export_rqvae,
        save_reference_checkpoint,
    )

    kind, model_or_conf, vars_or_params, config = load_model_from_ckpt(
        args.model_path, use_ema=args.ema
    )
    if kind == "rq-vae":
        sd = export_rqvae(
            jax.device_get(vars_or_params["params"]),
            jax.device_get(vars_or_params["codebook"]["state"]),
            model_or_conf.quantizer_config,
        )
    else:
        sd = export_rqtransformer(jax.device_get(vars_or_params), model_or_conf)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "model.pt")
    save_reference_checkpoint(out, sd)
    src_cfg = os.path.join(os.path.dirname(args.model_path), "config.yaml")
    if os.path.exists(src_cfg):
        shutil.copy(src_cfg, os.path.join(args.out_dir, "config.yaml"))
    print(f"exported {kind} ({len(sd)} tensors) -> {out} (reference format)")


if __name__ == "__main__":
    main()
