"""Infra tests: accumulator entropy, EMA semantics, checkpoint roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp

from rqvae_tpu.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from rqvae_tpu.models.ema import ema_update
from rqvae_tpu.trainers.accumulator import AccmStage1, compute_entropy
from rqvae_tpu.utils.setup import make_grid


class TestAccumulator:
    def test_entropy_matches_reference(self):
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            "ref_loss", "/root/reference/rqvae/optimizer/loss.py"
        )
        ref_loss = importlib.util.module_from_spec(spec)
        sys.modules["ref_loss"] = spec.loader.exec_module(ref_loss) or ref_loss

        import torch

        counts = np.random.RandomState(0).randint(0, 50, (3, 16)).astype(np.float64)
        ref = ref_loss.torch_compute_entropy(torch.from_numpy(counts)).numpy()
        mine = compute_entropy(counts)
        np.testing.assert_allclose(mine, ref, rtol=1e-6)

    def test_usage_histogram_and_summary(self):
        accm = AccmStage1(["loss_total"], n_codebook=2, codebook_size=8)
        codes = np.zeros((4, 2, 2, 2), np.int32)  # all code 0
        codes[..., 1] = 3  # second codebook all code 3
        accm.update([codes], {"loss_total": 2.0}, count=4)
        s = accm.get_summary()
        assert s["loss_total"] == 0.5  # 2.0 / 4
        ents = s["ent_codes_wo_pad"][0]
        np.testing.assert_allclose(ents, [0.0, 0.0], atol=1e-9)  # single-code usage
        assert accm.codebooks[0][0, 0] == 16 and accm.codebooks[0][1, 3] == 16


class TestEMA:
    def test_warmup_decay_matches_reference(self):
        """decay = min(mu, (1+step)/(10+step)) (reference ema.py:31-48)."""
        p0 = {"w": jnp.ones((3,))}
        p1 = {"w": jnp.zeros((3,))}
        out = ema_update(p0, p1, step=0, mu=0.9999)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3), rtol=1e-6)
        out = ema_update(p0, p1, step=990, mu=0.9999)
        np.testing.assert_allclose(
            np.asarray(out["w"]), (991 / 1000) * np.ones(3), rtol=1e-6
        )
        out = ema_update(p0, p1, step=10 ** 8, mu=0.9999)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9999 * np.ones(3), rtol=1e-6)


class TestCheckpoint:
    def test_roundtrip_and_latest(self, tmp_path):
        state = {
            "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "step": jnp.int32(7),
        }
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, state, 0)
        state2 = jax.tree.map(lambda x: x * 2, state)
        save_checkpoint(d, state2, 5)
        assert latest_step(d) == 5
        target = jax.tree.map(jnp.zeros_like, state)
        restored = restore_checkpoint(d, target)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]), np.asarray(state2["params"]["w"])
        )
        restored0 = restore_checkpoint(d, target, step=0)
        np.testing.assert_allclose(
            np.asarray(restored0["params"]["w"]), np.asarray(state["params"]["w"])
        )


def test_make_grid():
    imgs = np.random.rand(4, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=2, padding=1)
    assert grid.shape == (2 * 9 + 1, 2 * 9 + 1, 3)
    np.testing.assert_allclose(grid[1:9, 1:9], imgs[0])

    def test_async_save_restores_after_wait(self, tmp_path):
        """block=False returns before the write is durable; restore (which
        waits for pending commits) and wait_for_checkpoints must both see
        the finished files — the trainers save per-epoch with block=False
        so the multi-GB state write overlaps the next epoch."""
        from rqvae_tpu.checkpoint import wait_for_checkpoints

        state = {"params": {"w": jnp.ones((4, 4), jnp.float32) * 3}}
        d = str(tmp_path / "ckpt_async")
        save_checkpoint(d, state, 2, block=False)
        target = jax.tree.map(jnp.zeros_like, state)
        restored = restore_checkpoint(d, target)  # waits internally
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)
        save_checkpoint(d, state, 3, block=False)
        wait_for_checkpoints()
        assert latest_step(d) == 3
