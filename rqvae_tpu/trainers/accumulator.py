"""Metric accumulators with per-codebook usage entropy.

Host-side numpy re-implementation of the reference accumulators
(/root/reference/rqvae/trainers/accumulator.py:23-245): running metric sums,
per-depth codebook usage histograms, and usage-entropy summaries (with and
without the padding index). Cross-device sync happens in-step via GSPMD, so
the torch `all_gather_cat` path collapses to plain host sums here.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np


def compute_entropy(counts: np.ndarray, axis: int = -1) -> np.ndarray:
    """Entropy of normalized count histograms (reference
    optimizer/loss.py:44-48 torch_compute_entropy)."""
    probs = counts / np.clip(counts.sum(axis=axis, keepdims=True), 1e-12, None)
    p = np.clip(probs, 1e-12, None)
    return -(probs * np.log(p)).sum(axis=axis)


class Summary(dict):
    def __getattr__(self, k):
        return self[k]

    @property
    def metrics(self):
        return {
            k: v
            for k, v in self.items()
            if k not in ("ent_codes_w_pad", "ent_codes_wo_pad", "xs")
        }

    def print_line(self) -> str:
        return ", ".join(
            f"{k}: {float(np.asarray(v)):.4f}"
            for k, v in self.metrics.items()
        )


class AccmStage1:
    """Reference AccmStage1WithGAN equivalent: pass the metric name list."""

    def __init__(
        self,
        metric_names: Sequence[str],
        n_codebook: int = 1,
        codebook_size=512,
        code_hier: int = 1,
        use_padding_idx: bool = False,
    ):
        self.metric_names = list(metric_names)
        self.n_codebook = n_codebook
        self.max_codebook_size = (
            max(codebook_size) if isinstance(codebook_size, Iterable) else codebook_size
        )
        self.use_padding_idx = use_padding_idx
        if use_padding_idx:
            self.max_codebook_size += 1
        self.code_hier = code_hier
        self.init()

    def init(self):
        self.sums = {k: 0.0 for k in self.metric_names}
        self.codebooks = [
            np.zeros((self.n_codebook, self.max_codebook_size), np.int64)
            for _ in range(self.code_hier)
        ]
        self.counter = 0

    def update(self, codes, metrics: dict, count: int = 1):
        """codes: list (per hier level) of [B, h, w, n_codebook] int arrays."""
        for k in self.metric_names:
            if k in metrics and metrics[k] is not None:
                self.sums[k] += float(np.asarray(metrics[k]))
        for level, code in enumerate(codes or []):
            code = np.asarray(code)
            flat = code.reshape(-1, code.shape[-1])  # [N, n_codebook]
            for b in range(self.n_codebook):
                self.codebooks[level][b] += np.bincount(
                    flat[:, b], minlength=self.max_codebook_size
                )
        self.counter += count

    def get_summary(self, n_inst: Optional[int] = None) -> Summary:
        n = n_inst if n_inst else max(self.counter, 1)
        out = Summary({k: v / n for k, v in self.sums.items()})
        if self.use_padding_idx:
            out["ent_codes_w_pad"] = [
                compute_entropy(cb.astype(np.float64)) for cb in self.codebooks
            ]
            out["ent_codes_wo_pad"] = [
                compute_entropy(cb[:, :-1].astype(np.float64)) for cb in self.codebooks
            ]
        else:
            out["ent_codes_w_pad"] = None
            out["ent_codes_wo_pad"] = [
                compute_entropy(cb.astype(np.float64)) for cb in self.codebooks
            ]
        return out


class AccmStage2:
    """Simple running means for stage-2 metrics."""

    def __init__(self, metric_names: Sequence[str]):
        self.metric_names = list(metric_names)
        self.init()

    def init(self):
        self.sums = {k: 0.0 for k in self.metric_names}
        self.counter = 0

    def update(self, metrics: dict, count: int = 1):
        for k in self.metric_names:
            if k in metrics and metrics[k] is not None:
                self.sums[k] += float(np.asarray(metrics[k])) * count
        self.counter += count

    def get_summary(self, n_inst: Optional[int] = None) -> Summary:
        n = n_inst if n_inst else max(self.counter, 1)
        return Summary({k: v / n for k, v in self.sums.items()})
