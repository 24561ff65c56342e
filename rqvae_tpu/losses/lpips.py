"""LPIPS perceptual loss (VGG16 features + learned 1x1 weights), NHWC flax.

Re-design of /root/reference/rqvae/losses/vqgan/lpips.py:11-127. The
reference auto-downloads torchvision VGG16 + the vgg_lpips linear weights
(lpips_utils.py:6-48); this environment has zero egress, so weights load from
a local torch checkpoint when available (see `load_lpips_params`):

 - set RQVAE_TPU_LPIPS_VGG=<path to torchvision vgg16 state_dict .pth>
 - set RQVAE_TPU_LPIPS_LIN=<path to taming vgg_lpips .pth (lin0..lin4)>

Without weights the module still runs with its random init (keeps training
pipelines executable end-to-end; reconstructions then lack the perceptual
term's semantics — flagged by `pretrained=False` in the return).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features conv channels per slice (reference lpips.py:16)
VGG_SLICES = (
    ((3, 64), (64, 64)),  # relu1_2: features[0], features[2]
    ((64, 128), (128, 128)),  # relu2_2: features[5], features[7]
    ((128, 256), (256, 256), (256, 256)),  # relu3_3
    ((256, 512), (512, 512), (512, 512)),  # relu4_3
    ((512, 512), (512, 512), (512, 512)),  # relu5_3
)
CHNS = (64, 128, 256, 512, 512)

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv slices with relu taps at 1_2, 2_2, 3_3, 4_3, 5_3.

    `dtype` is the flax compute dtype: params stay fp32, conv inputs/kernels
    are cast to `dtype` (bf16 doubles the MXU rate and halves feature-map
    HBM traffic — the AMP equivalent of the reference's torch autocast)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        taps = []
        for si, convs in enumerate(VGG_SLICES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci, (_, out_ch) in enumerate(convs):
                x = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """input/target NHWC in [-1, 1] -> scalar (reference lpips.py:41-59).

    `dtype=jnp.bfloat16` runs the VGG tower + feature diffs in bf16 compute
    (params fp32; channel-norm reduces accumulate fp32; returned loss fp32).
    Training uses bf16 (GanLossConfig.lpips_bf16); eval metrics keep fp32."""

    dtype: Any = None

    @nn.compact
    def __call__(self, input, target, reduction: str = "mean"):
        net = VGG16Features(dtype=self.dtype, name="net")
        lins = [
            self.param(f"lin{k}", nn.initializers.normal(0.1), (CHNS[k], 1))
            for k in range(5)
        ]

        def scale_in(x):
            x = (x - SHIFT) / SCALE
            return x.astype(self.dtype) if self.dtype is not None else x

        f0 = net(scale_in(input))
        f1 = net(scale_in(target))

        val = 0.0
        for k in range(5):
            a = _unit_normalize(f0[k])
            b = _unit_normalize(f1[k])
            diff = jnp.square(a - b)
            # 1x1 conv == channel matmul; spatial average (lpips.py:50,126-127)
            # bf16 diff @ fp32 lin promotes to fp32, so the spatial mean
            # accumulates fp32 either way
            res = jnp.mean(diff @ lins[k], axis=(1, 2), keepdims=True)
            val = val + res

        val = val.astype(jnp.float32)
        if reduction == "none":
            return val
        if reduction == "mean":
            return jnp.mean(val)
        return jnp.sum(val)


def _unit_normalize(x, eps=1e-10):
    # fp32 accumulation of the channel sum-of-squares even in bf16 compute
    # (fused by XLA — the feature map itself stays in `x.dtype` in HBM)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True,
                            dtype=jnp.float32))
    return x / (norm + eps).astype(x.dtype)


def init_lpips(rng=None) -> dict:
    model = LPIPS()
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @jax.jit
    def _init(rng):
        x = jnp.zeros((1, 64, 64, 3))
        return model.init(rng, x, x)

    return _init(rng)


def convert_lpips(variables: dict, vgg_sd, lin_sd=None) -> dict:
    """Torch state_dicts -> LPIPS flax variables.

    vgg_sd: torchvision vgg16 state_dict ('features.N.weight' keys);
    lin_sd: taming vgg_lpips state_dict ('linK.model.1.weight' keys,
    reference lpips.py:73-79). Numeric parity vs the executed reference is
    asserted in tests/test_eval_parity.py."""
    # torchvision vgg16 features conv indices in order
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = jax.device_get(variables)["params"]
    flat_names = [
        f"conv{si}_{ci}" for si, convs in enumerate(VGG_SLICES) for ci in range(len(convs))
    ]
    for name, idx in zip(flat_names, conv_idx):
        w = vgg_sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = vgg_sd[f"features.{idx}.bias"].numpy()
        params["net"][name]["kernel"] = w
        params["net"][name]["bias"] = b

    if lin_sd is not None:
        for k in range(5):
            w = lin_sd[f"lin{k}.model.1.weight"].numpy()  # [1, C, 1, 1]
            params[f"lin{k}"] = w[:, :, 0, 0].T
    return {"params": params}


def load_lpips_params(
    vgg_path: Optional[str] = None, lin_path: Optional[str] = None
) -> tuple[dict, bool]:
    """(variables, pretrained?) — converts torch weights when present."""
    vgg_path = vgg_path or os.environ.get("RQVAE_TPU_LPIPS_VGG")
    lin_path = lin_path or os.environ.get("RQVAE_TPU_LPIPS_LIN")
    variables = init_lpips()
    if not (vgg_path and os.path.exists(vgg_path)):
        return variables, False

    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = None
    if lin_path and os.path.exists(lin_path):
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    return convert_lpips(variables, vgg_sd, lin_sd), True
