"""Input-pipeline throughput: DataLoader img/s on synthetic JPEGs.

Settles VERDICT r1 weak #8 (is training input-bound?): measures the
threaded decode+augment loader against the measured TPU step rates
(stage-1 51.4 img/s/chip, stage-2 110.6 img/s/chip at 256px).

Run: python tools/bench_loader.py [n_images] [workers] [procs]
  procs > 0 switches to the process-parallel decode path (num_procs) —
  the threaded path is GIL-bound near one core's decode rate, so on
  multi-core hosts processes are the way past it. (This image has ONE
  CPU, so both paths cap at the single-core rate here.)
"""

import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from rqvae_tpu.data import create_transforms
from rqvae_tpu.data.datasets import ImageFolder
from rqvae_tpu.data.loader import DataLoader


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    procs = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        d = os.path.join(root, "class_0")
        os.makedirs(d)
        # ImageNet-like JPEGs (short side ~ 400)
        for i in range(max(n // 10, 64)):
            arr = rng.randint(0, 255, (420, 500, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpg"), quality=90)

        cfg = {"transforms": {"type": "imagenet256x256"}}
        ds = ImageFolder(root, create_transforms(cfg, "train"))
        # repeat the files to reach n items without more disk
        ds.items = (ds.items * (n // len(ds.items) + 1))[:n]

        loader = DataLoader(
            ds, batch_size=64, shuffle=True, num_workers=workers,
            num_procs=procs,
        )
        # warmup one epoch chunk
        it = iter(loader)
        next(it)
        t0 = time.time()
        count = 64  # first batch consumed above
        for batch in it:
            count += batch["images"].shape[0]
        dt = time.time() - t0
        mode = f"{procs} procs" if procs else f"{workers} threads"
        print(
            f"loader: {count - 64} imgs in {dt:.2f}s = "
            f"{(count - 64) / dt:.1f} img/s ({mode}, 256px train augment)"
        )


if __name__ == "__main__":
    main()
