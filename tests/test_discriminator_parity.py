"""ActNorm + PatchGAN discriminator parity vs the EXECUTED torch reference.

Closes VERDICT round-1 Missing #5: the ActNorm data-dependent initialisation
(reference discriminator.py:22-68) was a stub. These tests convert identical
weights, run `initialize_actnorm` on the same batch the torch model lazily
initialises from, and assert loc/scale and the full discriminator output
match.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import ref_loader

from rqvae_tpu.losses.discriminator import (
    NLayerDiscriminator,
    initialize_actnorm,
)


def _convert_disc(ref_disc, n_layers=3):
    """torch NLayerDiscriminator state_dict -> flax params (ActNorm variant).
    Sequential indices: conv at 0, then (conv, norm, lrelu) triples, conv_out
    last (reference discriminator.py:126-150)."""
    sd = ref_disc.state_dict()
    params = {}
    conv_idx = [0] + [2 + 3 * n for n in range(n_layers)] + [2 + 3 * n_layers]
    names = ["conv_0"] + [f"conv_{n}" for n in range(1, n_layers + 1)] + ["conv_out"]
    for name, idx in zip(names, conv_idx):
        w = sd[f"main.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
        entry = {"kernel": jnp.asarray(w)}
        bkey = f"main.{idx}.bias"
        if bkey in sd:
            entry["bias"] = jnp.asarray(sd[bkey].numpy())
        params[name] = entry
    for n in range(1, n_layers + 1):
        idx = 3 * n
        params[f"norm_{n}"] = {
            "loc": jnp.asarray(sd[f"main.{idx}.loc"].numpy().transpose(0, 2, 3, 1)),
            "scale": jnp.asarray(sd[f"main.{idx}.scale"].numpy().transpose(0, 2, 3, 1)),
        }
    return {"params": params}


class TestActNormParity:
    def test_data_dependent_init_and_forward(self):
        ref_mod = ref_loader.load_ref_discriminator()
        torch.manual_seed(0)
        ref_disc = ref_mod.NLayerDiscriminator(
            input_nc=3, ndf=16, n_layers=3, use_actnorm=True
        ).apply(ref_mod.weights_init)

        x = np.random.RandomState(5).randn(4, 32, 32, 3).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

        # convert BEFORE the torch lazy init (loc=0, scale=1 on both sides)
        variables = _convert_disc(ref_disc)
        disc = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3, use_actnorm=True)
        variables = initialize_actnorm(disc, variables, jnp.asarray(x))

        # torch: first TRAIN-mode forward triggers ActNorm.initialize
        ref_disc.train()
        with torch.no_grad():
            out_t = ref_disc(xt)[0].numpy()

        # loc/scale match the torch data-dependent values
        for n in range(1, 4):
            an = dict(ref_disc.named_modules())[f"main.{3 * n}"]
            np.testing.assert_allclose(
                np.asarray(variables["params"][f"norm_{n}"]["loc"])[0, 0, 0],
                an.loc.detach().numpy()[0, :, 0, 0],
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(variables["params"][f"norm_{n}"]["scale"])[0, 0, 0],
                an.scale.detach().numpy()[0, :, 0, 0],
                rtol=1e-4, atol=1e-5,
            )

        out_j = np.asarray(disc.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(
            out_j, out_t.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )

    def test_post_init_output_is_normalized(self):
        """After init, each ActNorm's output on the init batch has ~zero mean
        and ~unit std per channel (the defining property)."""
        import jax

        disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2, use_actnorm=True)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32))
        variables = disc.init(jax.random.PRNGKey(0), x)
        variables = initialize_actnorm(disc, variables, x)
        _, inter = disc.apply(
            variables, x, train=False,
            capture_intermediates=lambda mdl, _m: mdl.name == "norm_1",
            mutable=["intermediates"],
        )
        h = inter["intermediates"]["norm_1"]["__call__"][0]
        h = np.asarray(h).reshape(-1, h.shape[-1])
        np.testing.assert_allclose(h.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(h.std(0, ddof=1), 1.0, atol=1e-3)
