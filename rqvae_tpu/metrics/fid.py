"""FID / rFID: inception activations, Gaussian statistics, Frechet distance.

Re-implementation of /root/reference/rqvae/metrics/fid.py:61-314 with
identical artifact formats (samples*.pkl sample stores, acts.npz, reference
fid_stats npz with mu/sigma) so outputs interoperate with the reference
tooling. TPU-side improvements: activations run as jitted batches and rFID
reconstructs WHOLE batches through the stage-1 model (the reference loops
images one-by-one, fid.py:166-169 — pure throughput change, identical
statistics).
"""

from __future__ import annotations

import glob
import logging
import os
import pickle
from pathlib import Path
from typing import Callable, Optional

import numpy as np
from scipy import linalg

import jax
import jax.numpy as jnp

from rqvae_tpu.metrics.inception import FIDInceptionV3, load_fid_inception


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (reference fid.py:61-115)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        logging.warning("fid: singular product; adding %s to diagonal", eps)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def mean_covar(acts: np.ndarray):
    acts = np.asarray(acts, np.float64)
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


class InceptionExtractor:
    """Jitted batched activation/logit extraction. Inputs [0,1] NHWC (or NCHW
    auto-transposed for pkl compatibility with the reference's sample dumps)."""

    def __init__(self, weights_path: Optional[str] = None, batch_size: int = 256):
        self.model, self.variables, self.pretrained = load_fid_inception(weights_path)
        if not self.pretrained:
            logging.warning(
                "FID inception running with RANDOM weights "
                "(set RQVAE_TPU_FID_WEIGHTS); numbers not comparable"
            )
        self.batch_size = batch_size
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))

    @staticmethod
    def _to_nhwc(x: np.ndarray) -> np.ndarray:
        if x.ndim == 4 and x.shape[1] == 3 and x.shape[-1] != 3:
            return np.transpose(x, (0, 2, 3, 1))
        return x

    def _run(self, batches, want: str):
        outs = []
        for xs in batches:
            xs = self._to_nhwc(np.asarray(xs, np.float32))
            n = xs.shape[0]
            if n < self.batch_size:  # pad to a fixed compile shape
                pad = np.zeros((self.batch_size - n, *xs.shape[1:]), np.float32)
                xs = np.concatenate([xs, pad])
            pool, logits = self._fwd(self.variables, jnp.asarray(xs))
            out = pool if want == "pool" else logits
            outs.append(np.asarray(out)[:n])
        return np.concatenate(outs, axis=0)

    def _batched(self, array_like):
        n = len(array_like)
        for i in range(0, n, self.batch_size):
            yield np.stack([np.asarray(array_like[j]) for j in range(i, min(i + self.batch_size, n))])

    def activations(self, images) -> np.ndarray:
        """images: iterable/array of [0,1] images -> [N, 2048]."""
        return self._run(self._batched(images), "pool")

    def logits(self, images) -> np.ndarray:
        return self._run(self._batched(images), "logits")

    def activations_batches(self, batch_iter) -> np.ndarray:
        return self._run(batch_iter, "pool")


# ---------------------------------------------------------------------------
# file-based pipeline (artifact-compatible with the reference)
# ---------------------------------------------------------------------------


def load_samples_from_files(path: str) -> np.ndarray:
    pkl_lists = sorted(glob.glob(os.path.join(path, "samples*.pkl")))
    if not pkl_lists:
        raise FileNotFoundError(f"no samples*.pkl under {path}")
    logging.info(
        "loading generated images from %s: [%s, ..., %s]",
        path, os.path.basename(pkl_lists[0]), os.path.basename(pkl_lists[-1]),
    )
    samples = []
    for pkl in pkl_lists:
        with open(pkl, "rb") as f:
            s = pickle.load(f)
        samples.append(np.asarray(s))
    return np.concatenate(samples, axis=0)


def compute_statistics_from_files(
    path: str,
    batch_size: int = 256,
    extractor: Optional[InceptionExtractor] = None,
    return_acts: bool = False,
):
    extractor = extractor or InceptionExtractor(batch_size=batch_size)
    samples = load_samples_from_files(path)
    acts = extractor.activations(samples)
    mu, sigma = mean_covar(acts)
    if return_acts:
        return mu, sigma, acts
    return mu, sigma


def compute_fid(fake_path: str, ref_stat_path: str, batch_size: int = 256) -> float:
    """FID of samples*.pkl under fake_path vs precomputed dataset stats npz
    (reference fid.py:285-314; caches acts.npz beside the samples)."""
    act_path = Path(fake_path) / "acts.npz"
    if not act_path.exists():
        mu, sigma, acts = compute_statistics_from_files(
            fake_path, batch_size=batch_size, return_acts=True
        )
        np.savez(act_path, acts=acts, mu=mu, sigma=sigma)
        logging.info("activations saved to %s", act_path.as_posix())
    acts_fake = np.load(act_path)
    stats_ref = np.load(ref_stat_path)
    return frechet_distance(
        stats_ref["mu"], stats_ref["sigma"], acts_fake["mu"], acts_fake["sigma"]
    )


def compute_rfid(
    dataset,
    recon_fn: Callable,  # jitted: [B,H,W,C] in [-1,1] -> recon in [-1,1]
    batch_size: int = 64,
    extractor: Optional[InceptionExtractor] = None,
) -> float:
    """Original-vs-reconstruction FID over a dataset (reference
    fid.py:269-282). recon_fn runs whole batches (vs the reference's
    per-image loop)."""
    extractor = extractor or InceptionExtractor()
    acts_orig, acts_recon = [], []
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")
    for i in range(0, n, batch_size):
        idxs = list(range(i, min(i + batch_size, n)))
        xs = np.stack([np.asarray(dataset[j][0]) for j in idxs])
        valid = len(idxs)
        if valid < batch_size:  # zero-pad the tail to a fixed compile shape
            xs = np.concatenate(
                [xs, np.zeros((batch_size - valid, *xs.shape[1:]), xs.dtype)]
            )
        orig01 = np.clip(xs * 0.5 + 0.5, 0, 1)
        recon = np.asarray(recon_fn(jnp.asarray(xs)))
        recon01 = np.clip(recon * 0.5 + 0.5, 0, 1)
        acts_orig.append(extractor.activations_batches([orig01])[:valid])
        acts_recon.append(extractor.activations_batches([recon01])[:valid])
    mu_o, s_o = mean_covar(np.concatenate(acts_orig))
    mu_r, s_r = mean_covar(np.concatenate(acts_recon))
    return frechet_distance(mu_o, s_o, mu_r, s_r)
