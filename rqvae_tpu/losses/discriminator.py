"""PatchGAN discriminator (pix2pix NLayerDiscriminator), NHWC flax.

Re-design of /root/reference/rqvae/losses/vqgan/discriminator.py:103-153:
stride-2 conv stack doubling filters (capped 8x), BatchNorm (or ActNorm),
LeakyReLU(0.2), final 1-channel patch map. torch's Conv2d(k=4, stride=2,
padding=1) pads 1 on all sides; flax padding=((1,1),(1,1)) + VALID with a
4x4 kernel reproduces it exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv4(features, stride, use_bias=True, name=None):
    return nn.Conv(
        features,
        (4, 4),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=use_bias,
        kernel_init=nn.initializers.normal(0.02),  # reference weights_init
        name=name,
    )


class ActNorm(nn.Module):
    """Data-dependent affine init (reference discriminator.py:9-68). The
    torch version lazily initialises from the first training batch; here the
    loc/scale are plain params initialised at zeros/ones — call
    `initialize_actnorm` on a sample batch for the data-dependent init."""

    num_features: int

    @nn.compact
    def __call__(self, x):
        loc = self.param("loc", nn.initializers.zeros, (1, 1, 1, self.num_features))
        scale = self.param("scale", nn.initializers.ones, (1, 1, 1, self.num_features))
        return scale * (x + loc)


def initialize_actnorm(disc: "NLayerDiscriminator", variables: dict, x) -> dict:
    """Data-dependent ActNorm initialisation from a sample batch
    (reference discriminator.py:22-68 `ActNorm.initialize`, triggered lazily
    on the first training forward :76-78): per channel, loc = -mean and
    scale = 1/(std+1e-6) of that norm's input. Norms are initialised in
    network order — each sees upstream norms already initialised, exactly
    like the torch lazy single-forward — by re-running the forward and
    capturing the preceding conv's output. Returns updated variables."""
    import copy

    assert disc.use_actnorm, "initialize_actnorm requires use_actnorm=True"
    params = copy.deepcopy(jax.device_get(dict(variables))["params"])
    for n in range(1, disc.n_layers + 1):
        conv_name, norm_name = f"conv_{n}", f"norm_{n}"
        _, inter = disc.apply(
            {"params": params},
            x,
            train=False,
            capture_intermediates=lambda mdl, _m, name=conv_name: mdl.name == name,
            mutable=["intermediates"],
        )
        h = inter["intermediates"][conv_name]["__call__"][0]  # norm input NHWC
        h = jnp.reshape(h, (-1, h.shape[-1])).astype(jnp.float32)
        mean = jnp.mean(h, axis=0)
        std = jnp.std(h, axis=0, ddof=1)  # torch .std(1) is Bessel-corrected
        params[norm_name]["loc"] = (-mean).reshape(1, 1, 1, -1)
        params[norm_name]["scale"] = (1.0 / (std + 1e-6)).reshape(1, 1, 1, -1)
    out = dict(variables)
    out["params"] = params
    return out


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        def norm(h, features, name):
            if self.use_actnorm:
                return ActNorm(features, name=name)(h)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                # reference weights_init: BN weight ~ N(1.0, 0.02)
                # (discriminator.py:98-100)
                scale_init=lambda key, shape, dtype=jnp.float32: 1.0
                + 0.02 * jax.random.normal(key, shape, dtype),
                name=name,
            )(h)

        use_bias = self.use_actnorm  # BatchNorm has affine params already

        h = _conv4(self.ndf, 2, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = _conv4(self.ndf * nf_mult, 2, use_bias=use_bias, name=f"conv_{n}")(h)
            h = norm(h, self.ndf * nf_mult, name=f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        h = _conv4(self.ndf * nf_mult, 1, use_bias=use_bias, name=f"conv_{self.n_layers}")(h)
        h = norm(h, self.ndf * nf_mult, name=f"norm_{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)

        return _conv4(1, 1, name="conv_out")(h)
