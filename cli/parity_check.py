"""Golden parity check against a reference torch checkpoint.

Validates this framework end-to-end against a released kakaobrain stage-1
checkpoint (.pt + config.yaml): converts the weights, runs both the torch
reference (executed from /root/reference on CPU) and this implementation on
the same inputs, and reports code-index agreement + reconstruction error —
the BASELINE.json north-star check ("match reconstructions and code indices
bit-for-bit within fp tolerance").

Usage: python cli/parity_check.py -m <stage1 ckpt .pt> [--image <path>] [--size 256]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from common import load_model_from_ckpt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model-path", required=True)
    p.add_argument("--image", default="", help="test image (random if absent)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reference-root", default="/root/reference")
    args = p.parse_args()

    # --- our side -------------------------------------------------------
    import jax.numpy as jnp

    kind, model, variables, config = load_model_from_ckpt(args.model_path)
    assert kind == "rq-vae"

    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((args.size, args.size))
        x = np.asarray(img, np.float32) / 255.0 * 2 - 1
        x = x[None]
    else:
        x = np.random.RandomState(0).rand(2, args.size, args.size, 3).astype(np.float32) * 2 - 1

    out, _, codes = model.apply(variables, jnp.asarray(x))
    out, codes = np.asarray(out), np.asarray(codes)

    # --- reference side (torch CPU, executed not copied) -----------------
    sys.path.insert(0, f"{args.reference_root}")
    import importlib.util
    import types

    import torch

    # minimal loader mirroring tests/ref_loader.py
    sys.path.insert(0, "tests")
    from ref_loader import load_rqvae_modules

    _, M, Q = load_rqvae_modules()
    ckpt = torch.load(args.model_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    hp = config.arch.hparams
    ref = _build_ref(M, Q, config.arch.ddconfig.to_dict(), hp)
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    if missing:
        print(f"(reference loader: {len(missing)} missing keys)", file=sys.stderr)

    ref.eval()
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref_out, _, ref_codes = ref(xt)
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    ref_codes = ref_codes.numpy()

    agree = (codes == ref_codes).mean()
    err = np.abs(out - ref_out).max()
    rel = err / (np.abs(ref_out).max() + 1e-8)
    print(f"code-index agreement: {agree * 100:.3f}%")
    print(f"reconstruction max abs err: {err:.5f} (rel {rel:.5f})")
    ok = agree > 0.999 and rel < 0.02
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


def _build_ref(M, Q, dd, hp):
    import torch

    class RefRQVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = M.Encoder(**dd)
            self.decoder = M.Decoder(**dd)
            self.quantizer = Q.RQBottleneck(
                latent_shape=list(hp.latent_shape),
                code_shape=list(hp.code_shape),
                n_embed=hp.n_embed,
                decay=hp.get("decay", 0.99),
                shared_codebook=hp.get("shared_codebook", False),
                restart_unused_codes=hp.get("restart_unused_codes", True),
            )
            self.quant_conv = torch.nn.Conv2d(dd["z_channels"], hp.embed_dim, 1)
            self.post_quant_conv = torch.nn.Conv2d(hp.embed_dim, dd["z_channels"], 1)

        def forward(self, x):
            z = self.quant_conv(self.encoder(x)).permute(0, 2, 3, 1).contiguous()
            z_q, loss, code = self.quantizer(z)
            out = self.decoder(self.post_quant_conv(z_q.permute(0, 3, 1, 2).contiguous()))
            return out, loss, code

    return RefRQVAE()


if __name__ == "__main__":
    main()
