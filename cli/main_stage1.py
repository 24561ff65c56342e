"""Stage-1 (RQ-VAE) training entry point.

Mirror of /root/reference/main_stage1.py:54-125: config setup, dataset,
model + discriminator + LPIPS, dual optimizers with warmup+cosine schedules,
epoch loop with eval/checkpointing. Single-controller JAX replaces the DDP
launch: run ONE process; the (data,) mesh shards the global batch.

Usage:
  python cli/main_stage1.py -m configs/.../stage1.yaml -r results/ [opts...]
"""

from __future__ import annotations

import argparse

from common import load_model_from_ckpt, set_seed  # noqa: F401

import jax

from rqvae_tpu.data import create_dataset
from rqvae_tpu.losses.discriminator import NLayerDiscriminator
from rqvae_tpu.losses.lpips import LPIPS, load_lpips_params
from rqvae_tpu.models import create_rqvae
from rqvae_tpu.optim.optimizer import create_optimizer
from rqvae_tpu.optim.schedule import create_schedule
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.trainers import trainer_stage1 as t1
from rqvae_tpu.trainers.loops import Stage1Trainer
from rqvae_tpu.utils.config import config_setup
from rqvae_tpu.utils.setup import setup


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-config", type=str, required=True)
    p.add_argument("-r", "--result-path", type=str, default="./results")
    p.add_argument("-l", "--load-path", type=str, default="")
    p.add_argument("-p", "--postfix", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", action="store_true")
    return p.parse_known_args()


def main():
    args, extra = parse_args()
    set_seed(args.seed)
    n_devices = len(jax.devices())
    config = config_setup(args, n_devices, args.model_config, extra)
    config, logger, writer = setup(args, config, extra)

    dataset_trn, dataset_val = create_dataset(config, is_eval=args.eval, logger=logger)

    model = create_rqvae(config.arch)
    disc_cfg = config.gan.disc.arch
    disc = NLayerDiscriminator(
        input_nc=disc_cfg.get("in_channels", 3),
        ndf=disc_cfg.get("ndf", 64),
        n_layers=disc_cfg.get("num_layers", 3),
        use_actnorm=disc_cfg.get("use_actnorm", False),
    )
    lpips = LPIPS()
    lpips_vars, pretrained = load_lpips_params()
    if not pretrained:
        logger.warning(
            "LPIPS running with RANDOM VGG weights (set RQVAE_TPU_LPIPS_VGG / "
            "RQVAE_TPU_LPIPS_LIN for the perceptual term to be meaningful)"
        )

    steps_per_epoch = max(
        len(dataset_trn) // config.experiment.batch_size, 1
    )
    sched = create_schedule(
        base_lr=config.optimizer.init_lr,
        warmup_config=config.optimizer.warmup,
        steps_per_epoch=steps_per_epoch,
        max_epoch=config.experiment.epochs,
        world_size=n_devices,
    )
    tx = create_optimizer(config.optimizer, sched)

    gan_loss_cfg = config.gan.loss
    gan_cfg = t1.GanLossConfig(
        disc_loss=gan_loss_cfg.disc_loss,
        gen_loss=gan_loss_cfg.gen_loss,
        disc_weight=gan_loss_cfg.disc_weight,
        perceptual_weight=gan_loss_cfg.perceptual_weight,
        disc_start=gan_loss_cfg.disc_start,
        lpips_bf16=gan_loss_cfg.get("lpips_bf16", True),
        amp_bf16=config.experiment.get("amp_bf16", False),
    )
    disc_sched = create_schedule(
        base_lr=config.gan.disc.optimizer.init_lr,
        warmup_config=config.gan.disc.optimizer.warmup,
        steps_per_epoch=steps_per_epoch,
        max_epoch=config.experiment.epochs - gan_cfg.disc_start,
        world_size=n_devices,
    )
    disc_tx = create_optimizer(config.gan.disc.optimizer, disc_sched)

    mesh = mesh_lib.create_mesh(n_devices, 1)
    sharding = mesh_lib.data_sharding(mesh)

    trainer = Stage1Trainer(
        model=model, disc=disc, lpips=lpips, lpips_vars=lpips_vars,
        gan_cfg=gan_cfg, tx=tx, disc_tx=disc_tx, config=config,
        dataset_trn=dataset_trn, dataset_val=dataset_val,
        logger=logger, writer=writer, sharding=sharding, seed=args.seed,
    )

    if args.load_path:
        _, _, variables, _ = load_model_from_ckpt(args.load_path)
        trainer.state = trainer.state.replace(
            params=variables["params"], codebook=variables["codebook"]
        )
        logger.info("loaded weights from %s", args.load_path)

    epoch_st = trainer.maybe_resume() if args.resume else 0
    if args.eval:
        trainer.logging(trainer.eval_epoch(0, valid=False), 0, "train")
        trainer.logging(trainer.eval_epoch(0, valid=True), 0, "valid")
    else:
        trainer.run_epoch(epoch_st)
    writer.close()


if __name__ == "__main__":
    main()
