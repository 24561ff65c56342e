"""Stage-2 (RQ-Transformer) training entry point.

NEW relative to the reference (its stage-2 trainer is withheld,
/root/reference/README.md:214-215); fully specified by the stage-2 configs
(loss type/temp/stochastic_codes, adamW + max_gn, total_batch_size 2048 with
grad accumulation) and the model's compute_loss.

Usage:
  python cli/main_stage2.py -m configs/.../stage2.yaml -r results/ \
      [vqvae.ckpt=<stage1 ckpt .pt>]
"""

from __future__ import annotations

import argparse

from common import set_seed

import jax
import jax.numpy as jnp

from rqvae_tpu.data import create_dataset, create_datasets
from rqvae_tpu.models import create_rqtransformer, load_rqvae
from rqvae_tpu.models.rqvae.model import RQVAE
from rqvae_tpu.optim.optimizer import create_optimizer
from rqvae_tpu.optim.schedule import create_schedule
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.trainers import trainer_stage2 as t2
from rqvae_tpu.trainers.loops import Stage2Trainer
from rqvae_tpu.utils.config import config_setup
from rqvae_tpu.utils.setup import setup


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-config", type=str, required=True)
    p.add_argument("-r", "--result-path", type=str, default="./results")
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

    # frozen stage-1
    vqvae, vq_vars = load_rqvae(config.vqvae, config.vqvae.ckpt)
    vq_state = vq_vars["codebook"]["state"]

    # bf16 frozen encode by default (experiment.encode_bf16: false for fp32);
    # as_args keeps the 100M-param encoder out of the HLO constant pool
    # (remote-compile uploads closure constants per compile)
    encode_fn, enc_vars = t2.make_frozen_encode_fn(
        vqvae, vq_vars,
        dtype=jnp.bfloat16
        if config.experiment.get("encode_bf16", True) else None,
        as_args=True,
    )

    tconf = create_rqtransformer(config.arch)

    is_text = config.arch.block_size_cond > 1
    if is_text:
        dataset_trn, dataset_val = create_datasets(config, logger=logger)
    else:
        dataset_trn, dataset_val = create_dataset(config, logger=logger)

    loss_cfg = t2.Stage2LossConfig(
        use_soft_target=config.loss.type == "soft_target_cross_entropy",
        temp=config.loss.temp,
        stochastic_codes=config.loss.stochastic_codes,
        txt_weight=config.loss.get("txt_weight", 0.1),
        img_weight=config.loss.get("img_weight", 0.9),
        amp_bf16=config.experiment.get("amp_bf16", True),
        remat=config.experiment.get("remat", False),
    )

    grad_accum = config.optimizer.get("grad_accm_steps", 1)
    steps_per_epoch = max(
        len(dataset_trn) // (config.experiment.batch_size * grad_accum), 1
    )
    sched = create_schedule(
        base_lr=config.optimizer.init_lr,
        warmup_config=config.optimizer.warmup,
        steps_per_epoch=steps_per_epoch,
        max_epoch=config.experiment.epochs,
        world_size=n_devices,
    )
    tx = create_optimizer(config.optimizer, sched)

    mesh = mesh_lib.create_mesh(n_devices, 1)
    sharding = mesh_lib.data_sharding(mesh)

    trainer = Stage2Trainer(
        config=config, tconf=tconf, loss_cfg=loss_cfg, tx=tx,
        encode_fn=encode_fn, encode_vars=enc_vars, vq_state=vq_state,
        vq_config=vqvae.quantizer_config,
        dataset_trn=dataset_trn, dataset_val=dataset_val,
        logger=logger, writer=writer, sharding=sharding,
        grad_accum_steps=grad_accum, seed=args.seed,
    )
    epoch_st = trainer.maybe_resume() if args.resume else 0
    if args.eval:
        summary = trainer.eval_epoch(0)
        logger.info("valid %s", summary.print_line())
    else:
        trainer.run_epoch(epoch_st)
    writer.close()


if __name__ == "__main__":
    main()
