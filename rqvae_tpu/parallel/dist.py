"""Distributed runtime environment.

Replaces the reference's torch.distributed/NCCL layer
(/root/reference/rqvae/utils/dist.py:20-103) with single-controller JAX:
`initialize()` sets up jax.distributed for multi-host (ICI within a slice,
DCN across slices — no hand-managed process group), `DistEnv` carries the
same fields the reference's trainers consumed, and `all_gather_cat` /
`barrier` provide the host-side collective helpers the eval/sampling paths
used. Inside jitted steps, collectives are implicit GSPMD (psum/all_gather
inserted by XLA from shardings) — see parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

import jax


@dataclasses.dataclass
class DistEnv:
    world_size: int  # total devices
    world_rank: int  # process index
    local_rank: int
    num_processes: int
    master: bool
    device_name: str

    @property
    def TOTAL_GPU(self):  # reference-compat alias (dist.py:23)
        return self.world_size


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistEnv:
    """Join the multi-host runtime when env/args say so; no-op single-host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or
    standard cloud-TPU autodetection) — the env:// rendezvous equivalent of
    reference dist.py:30-45."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 0)) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None)
    )
    if coordinator_address or num_processes:
        # CPU multi-process clusters (2-process CI, local testing) need a
        # cross-host collectives backend; gloo is the jax-bundled one. The
        # knob only affects the CPU client — TPU collectives ride ICI/DCN
        # regardless — so setting it unconditionally is safe.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return DistEnv(
        world_size=jax.device_count(),
        world_rank=jax.process_index(),
        local_rank=0,
        num_processes=jax.process_count(),
        master=jax.process_index() == 0,
        device_name=str(jax.devices()[0]),
    )


def all_gather_cat(x) -> np.ndarray:
    """Host-side gather of a (possibly sharded) global array — the
    reference's all_gather_cat (dist.py:94-103) for eval metrics and sampled
    pixels. With single-controller JAX a device_get of the global array IS
    the gather."""
    return np.asarray(jax.device_get(x))


def barrier():
    """Cross-process barrier (reference dist.py:80)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rqvae_tpu_barrier")
