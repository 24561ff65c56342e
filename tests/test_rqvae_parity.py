"""RQ-VAE model parity: run the reference torch Encoder/Decoder/RQVAE stack
with random weights, convert to flax, compare outputs (NCHW<->NHWC)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rqvae_tpu.checkpoint import torch_convert as tc
from rqvae_tpu.models.rqvae.model import RQVAE, RQVAEHParams
from rqvae_tpu.models.rqvae.modules import DDConfig, Decoder, Encoder

from ref_loader import load_rqvae_modules

DD = dict(
    double_z=False,
    z_channels=32,
    resolution=64,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2, 2],
    num_res_blocks=2,
    attn_resolutions=[16],
    dropout=0.0,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_mods():
    return load_rqvae_modules()


def test_encoder_parity(ref_mods):
    _, M, _ = ref_mods
    torch.manual_seed(0)
    ref = M.Encoder(**DD).eval()
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}

    cfg = DDConfig.create(DD)
    enc = Encoder(cfg)
    params = tc.convert_encoder(sd)

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(nchw(x))).numpy()
    out = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, nhwc(ref_out), rtol=2e-3, atol=2e-4)


def test_decoder_parity(ref_mods):
    _, M, _ = ref_mods
    torch.manual_seed(1)
    ref = M.Decoder(**DD).eval()
    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()}

    cfg = DDConfig.create(DD)
    dec = Decoder(cfg)
    params = tc.convert_decoder(sd)

    z = np.random.RandomState(1).randn(2, 16, 16, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(nchw(z))).numpy()
    out = np.asarray(dec.apply({"params": params}, jnp.asarray(z)))
    np.testing.assert_allclose(out, nhwc(ref_out), rtol=2e-3, atol=2e-4)


class RefRQVAE(torch.nn.Module):
    """Reference RQVAE assembled from its own building blocks
    (mirrors /root/reference/rqvae/models/rqvae/rqvae.py:26-109 wiring,
    executed for parity, not copied)."""

    def __init__(self, M, Q, dd, embed_dim, n_embed, latent_shape, code_shape):
        super().__init__()
        self.encoder = M.Encoder(**dd)
        self.decoder = M.Decoder(**dd)
        self.quantizer = Q.RQBottleneck(
            latent_shape=latent_shape,
            code_shape=code_shape,
            n_embed=n_embed,
            shared_codebook=True,
            restart_unused_codes=False,
        )
        self.quant_conv = torch.nn.Conv2d(dd["z_channels"], embed_dim, 1)
        self.post_quant_conv = torch.nn.Conv2d(embed_dim, dd["z_channels"], 1)

    def encode(self, x):
        z = self.quant_conv(self.encoder(x))
        return z.permute(0, 2, 3, 1).contiguous()

    def decode(self, z_q):
        z = self.post_quant_conv(z_q.permute(0, 3, 1, 2).contiguous())
        return self.decoder(z)

    def forward(self, x):
        z_e = self.encode(x)
        z_q, loss, code = self.quantizer(z_e)
        return self.decode(z_q), loss, code


def test_full_rqvae_parity(ref_mods):
    _, M, Q = ref_mods
    torch.manual_seed(2)
    embed_dim, n_embed = 32, 64
    latent_shape, code_shape = [16, 16, 32], [16, 16, 4]
    ref = RefRQVAE(M, Q, DD, embed_dim, n_embed, latent_shape, code_shape).eval()
    sd = ref.state_dict()

    hp = RQVAEHParams.create(
        dict(
            embed_dim=embed_dim,
            n_embed=n_embed,
            loss_type="mse",
            latent_shape=latent_shape,
            code_shape=code_shape,
            shared_codebook=True,
            restart_unused_codes=False,
        )
    )
    model = RQVAE(hparams=hp, ddconfig=DDConfig.create(DD), use_kernel=False)
    params, codebook = tc.convert_rqvae(sd, model.quantizer_config)
    variables = {"params": params, "codebook": {"state": codebook}}

    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref_out, ref_loss, ref_codes = ref(torch.from_numpy(nchw(x)))

    out, loss, codes = model.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
    np.testing.assert_allclose(np.asarray(out), nhwc(ref_out.numpy()), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-3)

    # decode_code path parity (reference rqvae.py:105-109)
    with torch.no_grad():
        ref_dec = ref.decode(ref.quantizer.embed_code(ref_codes)).numpy()
    dec = model.apply(variables, np.asarray(codes), method=RQVAE.decode_code)
    np.testing.assert_allclose(np.asarray(dec), nhwc(ref_dec), rtol=2e-2, atol=2e-3)


def test_jit_and_shapes():
    hp = RQVAEHParams.create(
        dict(
            embed_dim=16,
            n_embed=32,
            loss_type="l1",
            latent_shape=[8, 8, 16],
            code_shape=[8, 8, 2],
            shared_codebook=False,
            restart_unused_codes=True,
        )
    )
    dd = DDConfig.create({**DD, "resolution": 32, "z_channels": 16, "attn_resolutions": [8]})
    model = RQVAE(hparams=hp, ddconfig=dd, use_kernel=False)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "quantizer": jax.random.PRNGKey(1)}, x
    )

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x)

    out, loss, codes = fwd(variables, x)
    assert out.shape == (2, 32, 32, 3)
    assert codes.shape == (2, 8, 8, 2)

    # training path mutates the codebook collection
    out2, loss2, codes2 = model.apply(
        variables,
        x,
        training=True,
        rngs={"quantizer": jax.random.PRNGKey(2)},
        mutable=["codebook"],
    )[0]
    assert codes2.shape == (2, 8, 8, 2)
