"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multiprocess.py as `python mp_worker.py <pid> <nproc>
<coordinator> <outdir>`. Joins the cluster through the LIBRARY entry point
(rqvae_tpu.parallel.dist.initialize — the reference's env:// rendezvous
equivalent, /root/reference/rqvae/utils/dist.py:30-67), then exercises the
multi-process seams end to end:

  1. loader sharding (data/loader.py::shard_indices + DataLoader with a
     global-batch sharding assembled via make_array_from_process_local_data)
  2. one FULL stage-1 train step with the batch sharded over the global
     4-device (2 procs x 2 local) data mesh and replicated state — the
     gradient/codebook psum crosses the process boundary over gloo
  3. dist.barrier()

Writes a JSON result file per rank; the parent asserts cross-rank equality
and compares against a single-process run of the identical global step.

NOTE: runs standalone (no conftest) — must pin the CPU platform itself.
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

# Orphan watchdog: if the launching pytest dies (timeout, ctrl-C), workers
# must not linger fighting for the CPU — poll the parent and hard-exit when
# it disappears (jax.distributed collectives can block indefinitely).
_PARENT = os.getppid()


def _watchdog():
    import time as _t

    while True:
        _t.sleep(5)
        if os.getppid() != _PARENT:  # reparented -> parent died
            os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize pins TPU

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    from rqvae_tpu.parallel import dist

    env = dist.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert env.num_processes == nproc, env
    assert env.world_rank == pid and env.master == (pid == 0), env
    n_local = jax.local_device_count()
    assert jax.device_count() == nproc * n_local

    result = {"rank": pid, "world_size": env.world_size}

    # ---- 1. loader sharding across REAL processes -------------------------
    from rqvae_tpu.data.loader import DataLoader, shard_indices

    N = 13
    my_idx = shard_indices(N, epoch=3, process_index=pid, process_count=nproc)
    result["shard"] = [int(i) for i in my_idx]

    class _Dataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.full((2, 2), float(i), np.float32)

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    loader = DataLoader(
        _Dataset(), batch_size=8, shuffle=False, num_workers=1,
        sharding=NamedSharding(mesh, P("data")),
        collate=lambda items: np.stack(items),
    )
    sums = []
    checksum = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))
    for batch in loader:
        assert batch.shape == (8, 2, 2), batch.shape  # GLOBAL batch
        sums.append(float(np.asarray(checksum(batch))))
    result["loader_batch_sums"] = sums

    # ---- 2. full stage-1 train step across the process boundary -----------
    from test_trainers import make_stage1
    from rqvae_tpu.trainers import trainer_stage1 as t1

    model, disc, lpips, lpips_vars, tx, disc_tx, gan_cfg = make_stage1()
    state = t1.init_state(
        jax.random.PRNGKey(0), model, disc, tx, disc_tx, image_shape=(32, 32, 3)
    )
    step = jax.jit(
        t1.make_train_step(
            model, disc, lpips, lpips_vars, gan_cfg, tx, disc_tx,
            use_discriminator=True,
        )
    )
    B = 8
    # every process computes the SAME global batch, ships only its local rows
    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3)) * 2 - 1
    )
    rows_per_proc = B // nproc
    local_rows = images[pid * rows_per_proc : (pid + 1) * rows_per_proc]
    batch = {
        "images": jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local_rows
        )
    }
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state,
    )
    new_state, metrics, codes = step(state, batch, jax.random.PRNGKey(2))
    result["metrics"] = {
        k: float(np.asarray(v)) for k, v in sorted(metrics.items())
    }
    mean_fn = jax.jit(
        lambda s: [jnp.mean(l.astype(jnp.float64)) for l in jax.tree.leaves(s)],
        out_shardings=NamedSharding(mesh, P()),
    )
    result["param_means"] = [float(np.asarray(m)) for m in mean_fn(new_state.params)]
    result["codebook_mean"] = float(
        np.asarray(jax.jit(jnp.mean, out_shardings=repl)(
            new_state.codebook["state"].embed
        ))
    )

    # ---- 3. barrier --------------------------------------------------------
    dist.barrier()

    with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"rank {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
