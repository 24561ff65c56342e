"""Metrics tests: inception plumbing, FID math, file-based pipeline, IS."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.metrics import fid as fid_lib
from rqvae_tpu.metrics import is_score as is_lib
from rqvae_tpu.metrics.inception import FIDInceptionV3


@pytest.fixture(scope="module")
def extractor():
    # random weights; small batch for CPU speed
    return fid_lib.InceptionExtractor(batch_size=8)


class TestFrechet:
    def test_identical_stats_zero(self):
        rng = np.random.RandomState(0)
        acts = rng.randn(500, 16)
        mu, sigma = fid_lib.mean_covar(acts)
        assert abs(fid_lib.frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_shifted_positive_and_known_value(self):
        rng = np.random.RandomState(0)
        a = rng.randn(2000, 8)
        b = rng.randn(2000, 8) + 2.0
        mu1, s1 = fid_lib.mean_covar(a)
        mu2, s2 = fid_lib.mean_covar(b)
        d = fid_lib.frechet_distance(mu1, s1, mu2, s2)
        # ||mean shift||^2 = 8 * 4 = 32 dominates
        assert 28 < d < 38


class TestInception:
    def test_shapes(self, extractor):
        imgs = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32)
        acts = extractor.activations(imgs)
        assert acts.shape == (3, 2048)
        logits = extractor.logits(imgs)
        assert logits.shape == (3, 1008)

    def test_nchw_auto_transpose(self, extractor):
        imgs = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
        a1 = extractor.activations(imgs)
        a2 = extractor.activations(np.transpose(imgs, (0, 3, 1, 2)))
        np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-4)

    def test_converter_covers_all_params(self):
        """Every param of the flax net must be produced by the converter
        (fake state_dict with correctly-shaped zeros)."""
        from rqvae_tpu.metrics.inception import convert_fid_inception

        model = FIDInceptionV3()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        ref_params = jax.device_get(variables["params"])

        fake_sd = {}

        def fill_from(tree, prefix=""):
            for k, v in tree.items():
                name = f"{prefix}{k}"
                if isinstance(v, dict):
                    if "conv" in v:  # BasicConv subtree
                        kern = v["conv"]["kernel"]
                        fake_sd[f"{name}.conv.weight"] = np.zeros(
                            np.transpose(kern, (3, 2, 0, 1)).shape, np.float32
                        )
                        c = kern.shape[-1]
                        for suffix in ("weight", "bias", "running_mean", "running_var"):
                            fake_sd[f"{name}.bn.{suffix}"] = np.zeros((c,), np.float32)
                    else:
                        fill_from(v, f"{name}.")
                elif k == "kernel":  # fc
                    fake_sd[f"{prefix[:-1]}.weight"] = np.zeros(v.T.shape, np.float32)
                elif k == "bias":
                    fake_sd[f"{prefix[:-1]}.bias"] = np.zeros(v.shape, np.float32)

        fill_from(ref_params)
        converted = convert_fid_inception(fake_sd)

        flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
        flat_conv = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(converted)
        )
        for path, leaf in flat_ref:
            key = jax.tree_util.keystr(path)
            assert key in flat_conv, f"converter missing {key}"
            assert flat_conv[key].shape == leaf.shape, f"shape mismatch at {key}"


class TestFilePipeline:
    def test_fid_from_pkl_files(self, tmp_path, extractor):
        rng = np.random.RandomState(0)
        # two pkl shards, NCHW like the reference sampling dumps
        for i in range(2):
            with open(tmp_path / f"samples_{i}.pkl", "wb") as f:
                pickle.dump(rng.rand(6, 3, 32, 32).astype(np.float32), f)
        mu, sigma, acts = fid_lib.compute_statistics_from_files(
            str(tmp_path), extractor=extractor, return_acts=True
        )
        assert acts.shape == (12, 2048)
        assert mu.shape == (2048,) and sigma.shape == (2048, 2048)

        # reference-stats npz path
        np.savez(tmp_path / "ref_stats.npz", mu=mu, sigma=sigma)
        # compute_fid caches acts.npz then compares: self-FID ~ 0
        np.savez(tmp_path / "acts.npz", acts=acts, mu=mu, sigma=sigma)
        d = fid_lib.compute_fid(str(tmp_path), str(tmp_path / "ref_stats.npz"))
        assert abs(d) < 1e-4

    def test_rfid_identity_recon_is_zero(self, tmp_path, extractor):
        rng = np.random.RandomState(1)

        class DS:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return rng.rand(32, 32, 3).astype(np.float32) * 2 - 1, 0

        d = fid_lib.compute_rfid(
            DS(), recon_fn=lambda x: x, batch_size=4, extractor=extractor
        )
        assert abs(d) < 1e-3

    def test_inception_score(self, tmp_path, extractor):
        rng = np.random.RandomState(2)
        with open(tmp_path / "samples_0.pkl", "wb") as f:
            pickle.dump(rng.rand(16, 3, 32, 32).astype(np.float32), f)
        m, s = is_lib.compute_inception_score_from_files(
            str(tmp_path), splits=4, extractor=extractor
        )
        assert m >= 1.0 and np.isfinite(s)
