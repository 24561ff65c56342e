"""Epoch-loop trainers tying steps + data + logging + checkpoints together.

Mirrors the reference TrainerTemplate / TrainerRQVAE orchestration
(/root/reference/rqvae/trainers/trainer.py:90-131,
trainer_rqvae.py:137-403): per-epoch train, eval every test_freq (+EMA),
per-50-step scalars, per-250-step reconstruction grids, per-epoch codebook
usage entropies, checkpoints every save_ckpt_freq. The stage-2 loop is new
(the reference withholds it).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from rqvae_tpu.data.loader import DataLoader
from rqvae_tpu.models.rqvae.model import RQVAE
from rqvae_tpu.trainers import trainer_stage1 as t1
from rqvae_tpu.trainers import trainer_stage2 as t2
from rqvae_tpu.trainers.accumulator import AccmStage1, AccmStage2
from rqvae_tpu.utils.setup import Writer, make_grid

from rqvae_tpu.utils.config import env_flag

SMOKE_TEST = env_flag("SMOKE_TEST")


def _loader_procs() -> int:
    """Process-parallel decode workers (RQVAE_TPU_LOADER_PROCS, default 0 =
    threaded decode). The reference uses 16 torch DataLoader worker
    processes (trainer.py:45-51); set this on hosts where the threaded
    path's GIL-bound decode rate falls behind the step rate."""
    try:
        return int(os.environ.get("RQVAE_TPU_LOADER_PROCS", "0") or 0)
    except ValueError:
        return 0


def _write_config_beside(weights_dir: str, config):
    """config.yaml beside the weights so sampling/eval CLIs can load the
    checkpoint standalone (reference keeps config.yaml next to the .pt,
    main_sampling_fid.py:146-158)."""
    path = os.path.join(weights_dir, "config.yaml")
    if not os.path.exists(path):
        os.makedirs(weights_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(config.to_yaml())


class Stage1Trainer:
    METRIC_NAMES = [
        "loss_total", "loss_recon", "loss_latent", "loss_pcpt",
        "loss_gen", "loss_disc", "g_weight", "logits_real", "logits_fake",
    ]

    def __init__(
        self,
        *,
        model: RQVAE,
        disc,
        lpips,
        lpips_vars,
        gan_cfg: t1.GanLossConfig,
        tx,
        disc_tx,
        config,
        dataset_trn,
        dataset_val,
        logger,
        writer: Optional[Writer] = None,
        sharding=None,
        seed: int = 0,
    ):
        self.model = model
        self.config = config
        self.logger = logger
        self.writer = writer or Writer(None)
        self.gan_cfg = gan_cfg
        self.seed = seed

        bs = config.experiment.batch_size
        workers = 0 if SMOKE_TEST else 16
        procs = 0 if SMOKE_TEST else _loader_procs()
        self.loader_trn = DataLoader(
            dataset_trn, bs, shuffle=True, seed=seed, num_workers=max(workers, 1),
            sharding=sharding, num_procs=procs,
        )
        self.loader_val = DataLoader(
            dataset_val, bs, shuffle=False, drop_last=False,
            num_workers=max(workers, 1), sharding=sharding, num_procs=procs,
        )
        self.dataset_trn, self.dataset_val = dataset_trn, dataset_val

        image_shape = (
            config.arch.ddconfig.resolution, config.arch.ddconfig.resolution, 3
        )
        self.state = t1.init_state(
            jax.random.PRNGKey(seed), model, disc, tx, disc_tx,
            image_shape=image_shape, use_ema=config.arch.get("ema") is not None,
        )
        self._steps = {}
        for use_disc in (True, False):
            self._steps[use_disc] = jax.jit(
                t1.make_train_step(
                    model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
                    use_discriminator=use_disc,
                ),
                donate_argnums=(0,),
            )
        self._eval_steps = {
            (ud, ema): jax.jit(
                t1.make_eval_step(
                    model, disc, lpips, lpips_vars, gan_cfg,
                    use_discriminator=ud, use_ema=ema,
                )
            )
            for ud in (True, False)
            for ema in ((True, False) if config.arch.get("ema") else (False,))
        }
        self.n_codebook = config.arch.hparams.code_shape[-1]

    def get_accm(self):
        return AccmStage1(
            self.METRIC_NAMES,
            n_codebook=self.n_codebook,
            codebook_size=self.config.arch.hparams.n_embed,
            code_hier=self.config.arch.get("code_hier", 1),
            use_padding_idx=self.config.arch.hparams.get("use_padding_idx", False),
        )

    def train_epoch(self, epoch: int):
        use_disc = epoch >= self.gan_cfg.disc_start
        step_fn = self._steps[use_disc]
        accm = self.get_accm()
        self.loader_trn.set_epoch(epoch)
        rng = jax.random.PRNGKey(self.seed + 1)
        last_xs = None

        # metrics/codes stay ON DEVICE between flushes: a device_get per
        # step serialises dispatch through the transfer (measured as loop
        # overhead on the remote-tunnel chip); fetching every 50 steps keeps
        # the step pipeline busy and only syncs where scalars are logged.
        pending = []

        def flush():
            if not pending:
                return None
            # ONE device_get for the whole buffer (a transfer per step would
            # serialise dispatch through the tunnel)
            fetched = jax.device_get(pending)
            for m, c in fetched:
                accm.update([np.asarray(c)], m, count=1)
            pending.clear()
            return fetched[-1][0]  # last step's metrics, already on host

        for it, batch in enumerate(self.loader_trn):
            self.state, metrics, codes = step_fn(self.state, batch, rng)
            pending.append((metrics, codes))
            last_xs = batch["images"]

            global_iter = epoch * len(self.loader_trn) + it
            if (global_iter + 1) % 50 == 0:
                metrics_np = flush()
                for k, v in metrics_np.items():
                    self.writer.add_scalar(f"loss_step/{k}", v, "train", global_iter)
            if (global_iter + 1) % 250 == 0:
                self.log_reconstruction(last_xs, global_iter, tag="reconstruction_step")

        flush()
        summary = accm.get_summary()
        summary["xs"] = last_xs
        return summary

    def eval_epoch(self, epoch: int, valid: bool = True, ema: bool = False):
        use_disc = epoch >= self.gan_cfg.disc_start
        eval_fn = self._eval_steps[(use_disc, ema)]
        accm = self.get_accm()
        loader = self.loader_val if valid else self.loader_trn
        n_inst = 0
        last_xs = None
        for batch in loader:
            metrics, codes = eval_fn(self.state, batch)
            accm.update([np.asarray(codes)], jax.device_get(metrics), count=batch["images"].shape[0])
            n_inst += batch["images"].shape[0]
            last_xs = batch["images"]
        summary = accm.get_summary(n_inst)
        summary["xs"] = last_xs
        return summary

    def log_reconstruction(self, xs, step, tag="reconstruction", mode="train"):
        xs = jnp.asarray(np.asarray(xs)[:16])
        out, _, _ = self.model.apply(
            {"params": self.state.params, "codebook": self.state.codebook}, xs
        )
        self._write_grid(xs, out, tag, mode, step)

    def log_partial_reconstruction(self, xs, epoch: int, code_idx: int,
                                   mode: str, decode_type: str):
        """Per-depth partial-code reconstruction grids — the main stage-1
        codebook-health diagnostic (reference trainer_rqvae.py:366-389):
        'select' decodes only depth `code_idx`, 'add' decodes depths
        [0..code_idx]."""
        xs = jnp.asarray(np.asarray(xs)[:16])
        recon = self.model.apply(
            {"params": self.state.params, "codebook": self.state.codebook},
            xs, code_idx, decode_type, method=RQVAE.forward_partial_code,
        )
        tag = f"reconstruction_{decode_type}/{code_idx}-th code"
        self._write_grid(xs, recon, tag, mode, epoch)

    def _write_grid(self, xs, recon, tag, mode, step):
        real, recon = RQVAE.get_recon_imgs(xs, recon)
        n = real.shape[0] // 2
        grid = np.concatenate(
            [np.asarray(real[:n]), np.asarray(recon[:n]),
             np.asarray(real[n:]), np.asarray(recon[n:])]
        )
        self.writer.add_image(tag, make_grid(grid, nrow=max(n, 1)), mode, step)

    def logging(self, summary, epoch: int, mode: str):
        # recon + per-depth partial-code grids on the reference cadence
        # (trainer_rqvae.py:320-325)
        test_freq = 1 if SMOKE_TEST else self.config.experiment.get("test_freq", 10)
        if (epoch % 10 == 1 or epoch % test_freq == 0) and summary.get("xs") is not None:
            self.log_reconstruction(summary["xs"], epoch, mode=mode)
            if self.n_codebook > 1:
                for code_idx in range(self.n_codebook):
                    self.log_partial_reconstruction(
                        summary["xs"], epoch, code_idx, mode, "select"
                    )
                    self.log_partial_reconstruction(
                        summary["xs"], epoch, code_idx, mode, "add"
                    )
        for k, v in summary.metrics.items():
            self.writer.add_scalar(f"loss/{k}", v, mode, epoch)
        for level, ents in enumerate(summary["ent_codes_wo_pad"] or []):
            for book, ent in enumerate(np.atleast_1d(ents)):
                self.writer.add_scalar(
                    f"codebooks-wo-pad/entropy-level-{level}/codebook{book}",
                    ent, mode, epoch,
                )
        self.logger.info("ep:%d %s %s", epoch, mode, summary.print_line())

    def save_ckpt(self, epoch: int):
        # weights-only checkpoint for downstream loading (stage-2 / sampling
        # / rFID), analogous to the reference's state_dict entry. Saved
        # FIRST (it is small), then the full train state asynchronously —
        # its multi-GB write overlaps the next epoch (AsyncCheckpointer
        # serializes consecutive saves, so small-then-big minimizes the
        # blocking prefix).
        weights = {"params": self.state.params, "codebook": self.state.codebook}
        weights_dir = os.path.join(self.config.result_path, "weights")
        save_checkpoint(weights_dir, weights, epoch, block=False)
        _write_config_beside(weights_dir, self.config)
        ckpt_dir = os.path.join(self.config.result_path, "ckpt")
        path = save_checkpoint(ckpt_dir, self.state, epoch, block=False)
        self.logger.info("epoch %d: checkpoint saved (async) at %s", epoch, path)

    def maybe_resume(self):
        ckpt_dir = os.path.join(self.config.result_path, "ckpt")
        step = latest_step(ckpt_dir)
        if step is not None:
            self.state = restore_checkpoint(ckpt_dir, self.state, step)
            self.logger.info("resumed from epoch %d", step)
            return step + 1
        return 0

    def run_epoch(self, epoch_st: int = 0):
        exp = self.config.experiment
        test_freq = 1 if SMOKE_TEST else exp.get("test_freq", 10)
        save_freq = 1 if SMOKE_TEST else exp.get("save_ckpt_freq", 10)
        for epoch in range(epoch_st, exp.epochs):
            t0 = time.time()
            summary = self.train_epoch(epoch)
            self.logging(summary, epoch, "train")
            if epoch % test_freq == test_freq - 1:
                self.logging(self.eval_epoch(epoch), epoch, "valid")
                if self.state.ema_params is not None:
                    self.logging(self.eval_epoch(epoch, ema=True), epoch, "valid_ema")
            if epoch % save_freq == save_freq - 1:
                self.save_ckpt(epoch)
            self.logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
        wait_for_checkpoints()  # async writes must be durable before return


class Stage2Trainer:
    """Stage-2 loop (new — reference withholds its trainer, README.md:214)."""

    METRIC_NAMES = ["loss_total", "loss_img", "loss_txt", "grad_norm"]

    def __init__(
        self,
        *,
        config,
        tconf,
        loss_cfg: t2.Stage2LossConfig,
        tx,
        encode_fn,
        vq_state,
        vq_config,
        encode_vars=None,  # pass the frozen encoder as a jit ARG (see
        # make_frozen_encode_fn(as_args=True)): keeps the 100M-param
        # stage-1 encoder out of the HLO constant pool
        dataset_trn,
        dataset_val,
        logger,
        writer: Optional[Writer] = None,
        sharding=None,
        grad_accum_steps: int = 1,
        seed: int = 0,
    ):
        self.config = config
        self.tconf = tconf
        self.logger = logger
        self.writer = writer or Writer(None)
        self.seed = seed

        bs = config.experiment.batch_size * grad_accum_steps
        workers = 0 if SMOKE_TEST else 16
        procs = 0 if SMOKE_TEST else _loader_procs()
        self.loader_trn = DataLoader(
            dataset_trn, bs, shuffle=True, seed=seed,
            num_workers=max(workers, 1), sharding=sharding, num_procs=procs,
        )
        self.loader_val = DataLoader(
            dataset_val, bs, shuffle=False, drop_last=False,
            num_workers=max(workers, 1), sharding=sharding, num_procs=procs,
        )
        self.state = t2.init_state(
            jax.random.PRNGKey(seed), tconf, tx,
            use_ema=config.arch.get("ema") is not None,
        )
        self._enc_vars = encode_vars
        takes_vars = encode_vars is not None
        self._train_step = jax.jit(
            t2.make_train_step(
                tconf, loss_cfg, tx, encode_fn=encode_fn,
                vq_state=vq_state, vq_config=vq_config,
                grad_accum_steps=grad_accum_steps,
                encode_takes_vars=takes_vars,
            ),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            t2.make_eval_step(
                tconf, loss_cfg, encode_fn=encode_fn,
                vq_state=vq_state, vq_config=vq_config,
                encode_takes_vars=takes_vars,
            )
        )

    def train_epoch(self, epoch: int):
        accm = AccmStage2(self.METRIC_NAMES)
        self.loader_trn.set_epoch(epoch)
        rng = jax.random.PRNGKey(self.seed + 1)
        for it, batch in enumerate(self.loader_trn):
            self.state, metrics = self._train_step(self.state, batch, rng, self._enc_vars)
            metrics_np = jax.device_get(metrics)
            accm.update(metrics_np, count=1)
            global_iter = epoch * len(self.loader_trn) + it
            if (global_iter + 1) % 50 == 0:
                for k, v in metrics_np.items():
                    if np.ndim(v) == 0:
                        self.writer.add_scalar(f"loss_step/{k}", v, "train", global_iter)
        return accm.get_summary()

    def eval_epoch(self, epoch: int):
        accm = AccmStage2(["loss_total", "loss_img", "loss_txt"])
        # distinct key per batch (same base per epoch for comparable evals);
        # a fixed key would draw identical stochastic soft codes every batch
        base = jax.random.PRNGKey(1234)
        params = (
            self.state.ema_params if self.state.ema_params is not None else self.state.params
        )
        for i, batch in enumerate(self.loader_val):
            metrics = self._eval_step(params, batch, jax.random.fold_in(base, i),
                                      self._enc_vars)
            accm.update(jax.device_get(metrics), count=1)
        return accm.get_summary()

    def save_ckpt(self, epoch: int):
        # small weights snapshot first, then the full state async (see the
        # stage-1 save_ckpt note)
        weights = {"params": self.state.params}
        if self.state.ema_params is not None:
            weights["ema_params"] = self.state.ema_params
        weights_dir = os.path.join(self.config.result_path, "weights")
        save_checkpoint(weights_dir, weights, epoch, block=False)
        _write_config_beside(weights_dir, self.config)
        ckpt_dir = os.path.join(self.config.result_path, "ckpt")
        path = save_checkpoint(ckpt_dir, self.state, epoch, block=False)
        self.logger.info("epoch %d: checkpoint saved (async) at %s", epoch, path)

    def maybe_resume(self):
        ckpt_dir = os.path.join(self.config.result_path, "ckpt")
        step = latest_step(ckpt_dir)
        if step is not None:
            self.state = restore_checkpoint(ckpt_dir, self.state, step)
            self.logger.info("resumed from epoch %d", step)
            return step + 1
        return 0

    def run_epoch(self, epoch_st: int = 0):
        exp = self.config.experiment
        test_freq = 1 if SMOKE_TEST else exp.get("test_freq", 10)
        save_freq = 1 if SMOKE_TEST else exp.get("save_ckpt_freq", 10)
        for epoch in range(epoch_st, exp.epochs):
            summary = self.train_epoch(epoch)
            for k, v in summary.metrics.items():
                self.writer.add_scalar(f"loss/{k}", v, "train", epoch)
            self.logger.info("ep:%d train %s", epoch, summary.print_line())
            if epoch % test_freq == test_freq - 1:
                vs = self.eval_epoch(epoch)
                self.logger.info("ep:%d valid %s", epoch, vs.print_line())
            if epoch % save_freq == save_freq - 1:
                self.save_ckpt(epoch)
        wait_for_checkpoints()  # async writes must be durable before return
