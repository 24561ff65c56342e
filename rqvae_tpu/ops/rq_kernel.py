"""Pallas TPU kernel: fused L2-distance + argmin over a codebook.

The reference computes a full [N, n_embed] distance matrix via torch.addmm
then argmin (/root/reference/rqvae/models/rqvae/quantizations.py:43-69). For
n_embed = 16384 that matrix round-trips HBM every depth step. This kernel
streams codebook tiles through VMEM, keeps a running (min, argmin) per row in
VMEM scratch, and only ever writes the [N, 1] index vector — MXU does the
-2*x@c^T dot, VPU does the min/argmin reduction, fp32 accumulation throughout.

Tie-breaking matches torch/jnp argmin (first occurrence of the minimum):
within a tile jnp.argmin picks the first, and across tiles strictly-less
comparison keeps the earlier tile's winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256
_CB_TILE = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nearest_kernel(x_ref, cb_ref, cb_sq_ref, idx_ref, minval, minidx):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    cb_tile = cb_ref.shape[0]

    dots = jax.lax.dot_general(
        x_ref[:],
        cb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # full fp32: code-index parity
        preferred_element_type=jnp.float32,
    )  # [ROW_TILE, CB_TILE]
    # ||x||^2 omitted: constant per row, does not affect argmin.
    dist = cb_sq_ref[:] - 2.0 * dots

    local_min = jnp.min(dist, axis=1, keepdims=True)  # [ROW_TILE, 1]
    local_arg = (
        jnp.argmin(dist, axis=1).astype(jnp.int32).reshape(-1, 1) + j * cb_tile
    )

    @pl.when(j == 0)
    def _():
        minval[:] = local_min
        minidx[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < minval[:]
        minval[:] = jnp.where(better, local_min, minval[:])
        minidx[:] = jnp.where(better, local_arg, minidx[:])

    @pl.when(j == n_j - 1)
    def _():
        idx_ref[:] = minidx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_code_pallas(x2d: jax.Array, codebook: jax.Array, interpret: bool = False):
    """x2d: [N, dim] -> int32 [N] nearest codebook row indices."""
    n, dim = x2d.shape
    n_embed = codebook.shape[0]

    n_pad = _round_up(max(n, 8), _ROW_TILE)
    cb_tile = min(_CB_TILE, _round_up(n_embed, 128))
    e_pad = _round_up(n_embed, cb_tile)
    d_pad = _round_up(dim, 128)

    x_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :dim].set(
        x2d.astype(jnp.float32)
    )
    cb_p = jnp.zeros((e_pad, d_pad), jnp.float32).at[:n_embed, :dim].set(
        codebook.astype(jnp.float32)
    )
    cb_sq = jnp.full((1, e_pad), jnp.float32(jnp.finfo(jnp.float32).max / 2))
    cb_sq = cb_sq.at[0, :n_embed].set(
        jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)
    )

    grid = (n_pad // _ROW_TILE, e_pad // cb_tile)

    idx = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb_tile, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_ROW_TILE, 1), jnp.float32),
            pltpu.VMEM((_ROW_TILE, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * e_pad * d_pad,
            bytes_accessed=n_pad * d_pad * 4 + e_pad * d_pad * 4 * grid[0] + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, cb_p, cb_sq)

    return idx[:n, 0]


def _nearest_code_xla(x: jax.Array, codebook: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    dots = jax.lax.dot_general(
        x32,
        cb32,
        dimension_numbers=(((x32.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    cb_sq = jnp.sum(jnp.square(cb32), axis=-1)
    return jnp.argmin(cb_sq - 2.0 * dots, axis=-1).astype(jnp.int32)


def nearest_code(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-codebook-entry indices for x[..., dim] against [n_embed, dim].

    Dispatches to the fused Pallas kernel on TPU, XLA elsewhere. Both paths
    share tie-break semantics (first occurrence of the minimum).
    """
    if jax.default_backend() != "tpu":
        return _nearest_code_xla(x, codebook)
    lead_shape = x.shape[:-1]
    idx = _nearest_code_pallas(x.reshape(-1, x.shape[-1]), codebook)
    return idx.reshape(lead_shape)
