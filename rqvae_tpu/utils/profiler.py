"""Profiling utilities.

Extends the reference's param-count-only Profiler
(/root/reference/rqvae/utils/profiler.py:3-27) with the TPU-native tools:
jax.profiler traces (TensorBoard-viewable) and device_get-based step timers
(the remote tunnel does not honor block_until_ready, so timing forces a tiny
transfer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np

import jax


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class Profiler:
    def __init__(self, logger=None):
        self.logger = logger

    def get_model_size(self, tree, opt: Optional[str] = None):
        n = count_params(tree)
        if self.logger:
            self.logger.info("#parameters: %.4fM (%s)", n / 1e6, opt or "model")
        return n


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard --logdir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that forces completion via device_get."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result_fn=None):
        t0 = time.time()
        yield
        if result_fn is not None:
            np.asarray(result_fn())
        self.times.append(time.time() - t0)

    def summary(self, skip: int = 1) -> dict:
        ts = np.asarray(self.times[skip:] or self.times)
        return {
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
            "steps": len(ts),
        }
