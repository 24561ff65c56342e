"""Device mesh + sharding rules.

The reference's only parallelism is DDP data-parallel over NCCL
(/root/reference/rqvae/utils/dist.py:70-103). Here distribution is
single-controller JAX: a (data, model) `jax.sharding.Mesh`, parameter
PartitionSpecs below, and GSPMD inserting the collectives over ICI. The
`model` axis tensor-parallelises the RQ-Transformer (Megatron-style
column/row split of attention and MLP, vocab-split classifier) for the
3.8B/3.9B configs; the RQ-VAE and small transformers run pure DP with
`model=1`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-leading arrays sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# RQ-Transformer tensor-parallel parameter specs
# ---------------------------------------------------------------------------


def _stack_specs() -> dict:
    """Megatron split for one stacked attention stack: qkv/mlp-in column
    parallel (shard output features), proj/mlp-out row parallel (shard input
    features); layernorms replicated. Leading dim is the layer axis."""
    return {
        "ln1": {"scale": P(), "bias": P()},
        "ln2": {"scale": P(), "bias": P()},
        "attn": {
            "wq": P(None, None, MODEL_AXIS),
            "wk": P(None, None, MODEL_AXIS),
            "wv": P(None, None, MODEL_AXIS),
            "wo": P(None, MODEL_AXIS, None),
            "bq": P(None, MODEL_AXIS),
            "bk": P(None, MODEL_AXIS),
            "bv": P(None, MODEL_AXIS),
            "bo": P(),
        },
        "mlp": {
            "w1": P(None, None, MODEL_AXIS),
            "b1": P(None, MODEL_AXIS),
            "w2": P(None, MODEL_AXIS, None),
            "b2": P(),
        },
    }


def transformer_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching init_transformer_params' layout."""
    specs: dict = {}
    for key, val in params.items():
        if key in ("body", "head"):
            specs[key] = _stack_specs()
        elif key == "classifier":
            specs[key] = {
                "ln_scale": P(),
                "ln_bias": P(),
                # vocab-split classifier: [C, V] or [D, C, V]
                "kernel": P(None, MODEL_AXIS)
                if val["kernel"].ndim == 2
                else P(None, None, MODEL_AXIS),
                "bias": P(MODEL_AXIS) if val["bias"].ndim == 1 else P(None, MODEL_AXIS),
            }
        elif key == "cond_classifier":
            specs[key] = {
                "ln_scale": P(),
                "ln_bias": P(),
                "kernel": P(None, MODEL_AXIS),
                "bias": P(MODEL_AXIS),
            }
        elif key == "tok_emb":
            specs[key] = P(None, None)  # replicated: lookups stay local
        else:
            specs[key] = jax.tree.map(lambda _: P(), val)
    return specs


def shard_pytree(tree, specs, mesh: Mesh):
    """Place a pytree on the mesh according to a matching spec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def zero_opt_state_specs(opt_state, mesh: Mesh):
    """ZeRO-1-style optimizer-state sharding specs: shard each moment tensor
    over the data axis on its first divisible dim; scalars/counters stay
    replicated. The reference has no FSDP/ZeRO equivalent (SURVEY §2.9
    'ABSENT') — in JAX it is just a placement decision and GSPMD inserts the
    gathers around the optimizer update."""
    n_data = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        if leaf.ndim == 0:
            return P()
        spec = [None] * leaf.ndim
        for axis in range(leaf.ndim):
            if leaf.shape[axis] % n_data == 0 and leaf.shape[axis] >= n_data:
                spec[axis] = DATA_AXIS
                break
        return P(*spec)

    return jax.tree.map(spec_for, opt_state)


def shard_opt_state_zero(opt_state, mesh: Mesh):
    """Apply ZeRO-1 placement to an optax optimizer state."""
    specs = zero_opt_state_specs(opt_state, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), opt_state, specs
    )
