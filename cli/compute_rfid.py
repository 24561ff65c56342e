"""rFID: FID between originals and stage-1 reconstructions.

Mirror of /root/reference/compute_rfid.py:54-82 — with batched
reconstruction instead of the reference's per-image loop (fid.py:166-169).

Usage: python cli/compute_rfid.py -m <stage1 ckpt> [--batch-size 64]
"""

from __future__ import annotations

import argparse
import logging

from common import load_model_from_ckpt

import jax

from rqvae_tpu.data import create_dataset
from rqvae_tpu.metrics.fid import compute_rfid
from rqvae_tpu.utils.config import augment_defaults


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--root", type=str, default="", help="dataset root override")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    kind, model, variables, config = load_model_from_ckpt(args.model_path)
    assert kind == "rq-vae"
    config = augment_defaults(config)
    if "experiment" not in config:
        config.experiment = {"total_batch_size": args.batch_size}
    if args.root:
        config.dataset.root = args.root
    trn, val = create_dataset(config, is_eval=True)
    dataset = val if args.split == "val" else trn

    @jax.jit
    def recon_fn(xs):
        out, _, _ = model.apply(variables, xs)
        return out

    rfid = compute_rfid(dataset, recon_fn, batch_size=args.batch_size)
    logging.info("rFID: %.4f", rfid)
    print(f"rFID: {rfid:.4f}")


if __name__ == "__main__":
    main()
