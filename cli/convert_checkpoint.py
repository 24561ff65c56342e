"""Convert a reference torch .pt checkpoint into native Orbax weights.

The sampling/eval CLIs load .pt directly (converted on the fly); this tool
materializes the converted pytree for faster repeated loading and for
environments without torch.

Usage:
  python cli/convert_checkpoint.py -m <ckpt.pt> -o <out_dir> [--ema]
  (config.yaml must sit beside the .pt, as in the reference releases)
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
    args = p.parse_args()

    from rqvae_tpu.checkpoint import save_checkpoint

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


if __name__ == "__main__":
    main()
