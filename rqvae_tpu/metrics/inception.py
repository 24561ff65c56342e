"""InceptionV3 (FID variant) in flax/NHWC.

Re-implementation of the pytorch-fid network used by the reference
(/root/reference/rqvae/metrics/inception.py:18-334): torchvision inception_v3
topology (num_classes=1008) with the FID-specific pooling patches —
InceptionA/C/E_1 use average pooling that excludes padding from the count,
and the final InceptionE_2 uses max pooling. Inputs are NHWC in [0, 1]
(bilinear-resized to 299 and rescaled to [-1, 1] like the reference
:153-160); outputs are the 2048-d pool features and the 1008-way logits.

Weights: convert the pt_inception-2015-12-05 torch checkpoint via
`convert_fid_inception` (path from RQVAE_TPU_FID_WEIGHTS). Without weights
the net runs with random init — FID numbers are then NOT comparable to
published values (flagged by the loader).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3


def avg_pool_nopad_count(x, window=3):
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), pad
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), pad
    )
    return summed / counts


def max_pool_3_1(x):
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        # inference BatchNorm: explicit running stats (torchvision eps=0.001)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(x)


def _b(f, k, s=1, p=0):
    if isinstance(k, int):
        k = (k, k)
    if isinstance(p, int):
        p = ((p, p), (p, p))
    else:
        p = ((p[0], p[0]), (p[1], p[1]))
    return dict(features=f, kernel=k, strides=(s, s), padding=p)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(**_b(64, 1), name="branch1x1")(x)
        b5 = BasicConv(**_b(48, 1), name="branch5x5_1")(x)
        b5 = BasicConv(**_b(64, 5, p=2), name="branch5x5_2")(b5)
        b3 = BasicConv(**_b(64, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(**_b(96, 3, p=1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(**_b(96, 3, p=1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_nopad_count(x)  # FID patch (inception.py:234-235)
        bp = BasicConv(**_b(self.pool_features, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(**_b(384, 3, s=2), name="branch3x3")(x)
        bd = BasicConv(**_b(64, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(**_b(96, 3, p=1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(**_b(96, 3, s=2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(**_b(192, 1), name="branch1x1")(x)
        b7 = BasicConv(**_b(c7, 1), name="branch7x7_1")(x)
        b7 = BasicConv(**_b(c7, (1, 7), p=(0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(**_b(192, (7, 1), p=(3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(**_b(c7, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(**_b(c7, (7, 1), p=(3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(**_b(c7, (1, 7), p=(0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(**_b(c7, (7, 1), p=(3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(**_b(192, (1, 7), p=(0, 3)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_nopad_count(x)  # FID patch (:262-263)
        bp = BasicConv(**_b(192, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(**_b(192, 1), name="branch3x3_1")(x)
        b3 = BasicConv(**_b(320, 3, s=2), name="branch3x3_2")(b3)
        b7 = BasicConv(**_b(192, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(**_b(192, (1, 7), p=(0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(**_b(192, (7, 1), p=(3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(**_b(192, 3, s=2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool  # FID: E_2 (Mixed_7c) uses max pool (:330)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(**_b(320, 1), name="branch1x1")(x)
        b3 = BasicConv(**_b(384, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv(**_b(384, (1, 3), p=(0, 1)), name="branch3x3_2a")(b3),
                BasicConv(**_b(384, (3, 1), p=(1, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv(**_b(448, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(**_b(384, 3, p=1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv(**_b(384, (1, 3), p=(0, 1)), name="branch3x3dbl_3a")(bd),
                BasicConv(**_b(384, (3, 1), p=(1, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = max_pool_3_1(x) if self.use_max_pool else avg_pool_nopad_count(x)
        bp = BasicConv(**_b(192, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    resize_input: bool = True
    normalize_input: bool = True  # [0,1] -> [-1,1]

    @nn.compact
    def __call__(self, x):
        """x: NHWC float in [0, 1]. Returns (pool_features [B, 2048],
        logits [B, 1008])."""
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv(**_b(32, 3, s=2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(**_b(32, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(**_b(64, 3, p=1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(**_b(80, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(**_b(192, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(use_max_pool=False, name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)

        pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]
        logits = nn.Dense(1008, name="fc")(pool)
        return pool, logits


# ---------------------------------------------------------------------------
# torch weight conversion (pt_inception-2015-12-05-6726825d.pth)
# ---------------------------------------------------------------------------


def _convert_basic(tree, sd, tkey, path):
    from rqvae_tpu.checkpoint.torch_convert import _np, _set, conv_kernel

    _set(tree, path + ("conv", "kernel"), conv_kernel(sd[f"{tkey}.conv.weight"]))
    _set(tree, path + ("bn_scale",), _np(sd[f"{tkey}.bn.weight"]))
    _set(tree, path + ("bn_bias",), _np(sd[f"{tkey}.bn.bias"]))
    _set(tree, path + ("bn_mean",), _np(sd[f"{tkey}.bn.running_mean"]))
    _set(tree, path + ("bn_var",), _np(sd[f"{tkey}.bn.running_var"]))


def convert_fid_inception(sd) -> dict:
    """pytorch-fid state_dict -> flax params for FIDInceptionV3."""
    from rqvae_tpu.checkpoint.torch_convert import _np, _set

    tree: dict = {}
    basics = [
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ]
    for name in basics:
        _convert_basic(tree, sd, name, (name,))

    def conv_all(mixed, branches):
        for b in branches:
            _convert_basic(tree, sd, f"{mixed}.{b}", (mixed, b))

    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        conv_all(m, ["branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"])
    conv_all("Mixed_6a", ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                          "branch3x3dbl_3"])
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        conv_all(m, ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"])
    conv_all("Mixed_7a", ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                          "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"])
    for m in ("Mixed_7b", "Mixed_7c"):
        conv_all(m, ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                     "branch3x3dbl_3b", "branch_pool"])

    _set(tree, ("fc", "kernel"), _np(sd["fc.weight"]).T)
    _set(tree, ("fc", "bias"), _np(sd["fc.bias"]))
    return tree


def load_fid_inception(weights_path: Optional[str] = None):
    """(variables, pretrained?) — random init if the checkpoint is absent."""
    weights_path = weights_path or os.environ.get("RQVAE_TPU_FID_WEIGHTS")
    model = FIDInceptionV3()
    if weights_path and os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = convert_fid_inception(sd)
        return model, {"params": params}, True
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables, False
