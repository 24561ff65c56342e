"""Golden parity check against a reference torch checkpoint.

Validates this framework end-to-end against a released kakaobrain
checkpoint (.pt + config.yaml): converts the weights, runs both the torch
reference (executed from /root/reference on CPU) and this implementation on
the same inputs, and reports agreement — the BASELINE.json north-star check
("match reconstructions and code indices bit-for-bit within fp tolerance").

Stage 1 (default): code-index agreement + reconstruction error.
Stage 2 (--stage2): forced-code per-(h,w,d) decode logits of our sampling
scan vs the reference `cached_forward` loop
(/root/reference/rqvae/models/rqtransformer/transformers.py:190-287).

Usage:
  python cli/parity_check.py -m <stage1 ckpt .pt> [--image <path>] [--size 256]
  python cli/parity_check.py -m <stage2 ckpt .pt> --stage2 [--batch 2]
    (stage-2 expects config.yaml beside the .pt; the stage-1 checkpoint is
     found via config.vqvae.ckpt or --vqvae)
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
    p.add_argument("--stage2", action="store_true")
    p.add_argument("--vqvae", default="", help="stage-1 ckpt for --stage2")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--reference-root", default="/root/reference")
    args = p.parse_args()

    # parity is defined against fp32 CPU torch; the TPU's bf16 matmul
    # default would contaminate the comparison
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.stage2:
        return main_stage2(args)

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
    print(f"full-forward recon max abs err: {err:.5f} (rel {rel:.5f})")

    # --- tie-aware code audit: a disagreement is only REAL if the two
    # chosen codes are not equidistant from the residual within fp noise
    # (torch addmm and our dot accumulate in different orders; exact ties
    # flip argmin legitimately, especially at deeper residual levels) ------
    from rqvae_tpu.models.rqvae.model import RQVAE
    from rqvae_tpu.ops import quantize as rq

    z_e = np.asarray(model.apply(variables, jnp.asarray(x), method=RQVAE.encode))
    qcfg = model.quantizer_config
    z = np.asarray(rq.to_code_shape(jnp.asarray(z_e), qcfg))
    state = variables["codebook"]["state"]
    residual = z.astype(np.float32)
    n_real_mismatch = 0
    n_tie = 0
    # positions whose residuals diverged at an upstream tie: deeper levels
    # follow a different (equally valid) residual path, so their codes are
    # incomparable — excluded rather than counted as real mismatches
    diverged = np.zeros(codes.shape[:-1], bool)
    n_cascade = 0
    for d in range(qcfg.depth):
        cb = np.asarray(state.embed[qcfg.codebook_index(d)][: qcfg.n_embed[d]])
        dist = np.asarray(rq.compute_distances(jnp.asarray(residual), jnp.asarray(cb)))
        ours_d, refs_d = codes[..., d], ref_codes[..., d]
        d_ours = np.take_along_axis(dist, ours_d[..., None], -1)[..., 0]
        d_refs = np.take_along_axis(dist, refs_d[..., None], -1)[..., 0]
        mism = (ours_d != refs_d) & ~diverged
        n_cascade += int(((ours_d != refs_d) & diverged).sum())
        gap = np.abs(d_ours - d_refs)
        scale = 1e-4 * (1.0 + np.abs(d_ours))
        tie = mism & (gap <= scale)
        n_tie += int(tie.sum())
        n_real_mismatch += int((mism & ~tie).sum())
        diverged |= tie
        residual = residual - cb[ours_d]
    total = codes[..., 0].size * qcfg.depth
    print(
        f"code audit: {n_real_mismatch} real mismatches, {n_tie} fp ties "
        f"(+{n_cascade} downstream of ties) / {total} codes"
    )

    # --- decoder parity on identical codes (immune to tie cascades) ------
    dec_ref_codes = np.asarray(
        model.apply(variables, jnp.asarray(ref_codes), method=RQVAE.decode_code)
    )
    dec_err = np.abs(dec_ref_codes - ref_out).max()
    dec_rel = dec_err / (np.abs(ref_out).max() + 1e-8)
    print(f"decode(ref codes) max abs err: {dec_err:.5f} (rel {dec_rel:.5f})")

    ok = n_real_mismatch == 0 and dec_rel < 0.02
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


def main_stage2(args):
    """Forced-code step-logits parity: our scan machinery vs the reference
    cached_forward at every (h, w, d) (the committed test logic of
    tests/test_rqtransformer_parity.py exposed for real checkpoints)."""
    import torch

    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    from ref_loader import load_rqtransformer_modules
    from test_rqtransformer_parity import FakeVQ, make_ref_config

    from rqvae_tpu.models.rqtransformer import sampling as S
    from rqvae_tpu.utils.config import augment_arch_defaults, load_config
    import os

    kind, tconf, params, config = load_model_from_ckpt(args.model_path)
    assert kind == "rq-transformer", "--stage2 expects an RQ-Transformer ckpt"

    # stage-1 codebooks for the vqvae-embedding input modes
    vq_state = vq_config = fake_vq = None
    if tconf.input_emb_vqvae or tconf.head_emb_vqvae:
        from rqvae_tpu.models import load_rqvae

        vq_ckpt = args.vqvae or config.get("vqvae", {}).get("ckpt", "")
        assert vq_ckpt, "--vqvae (or config.vqvae.ckpt) required for this arch"
        vq_cfg_path = os.path.join(os.path.dirname(vq_ckpt), "config.yaml")
        vq_arch = augment_arch_defaults(load_config(vq_cfg_path).arch)
        vq_model, vq_vars = load_rqvae(vq_arch, vq_ckpt)
        vq_state = vq_vars["codebook"]["state"]
        vq_config = vq_model.quantizer_config
        tables = [
            np.asarray(vq_state.embed[vq_config.codebook_index(d)][: vq_config.n_embed[d]])
            for d in range(tconf.depth)
        ]
        fake_vq = FakeVQ(
            np.stack(tables) if len(set(t.shape for t in tables)) == 1 else tables,
            list(vq_config.n_embed),
        )

    # reference model with the same weights
    _, _, _, T = load_rqtransformer_modules()
    ckpt = torch.load(args.model_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    arch = augment_arch_defaults(config.arch).to_dict()
    ref = T.RQTransformer(make_ref_config(T, arch)).eval()
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    if missing:
        print(f"(reference loader: {len(missing)} missing keys)", file=sys.stderr)

    B = args.batch
    H, W, D = tconf.block_size
    rng = np.random.RandomState(0)
    forced = rng.randint(0, min(tconf.vocab_size), (B, H, W, D))
    cond = rng.randint(0, max(tconf.vocab_size_cond, 1), (B, tconf.block_size_cond))

    ref_logits = np.zeros((B, H, W, D, tconf.vocab_size_max), np.float32)
    with torch.no_grad():
        ref.init_cache()
        xs = torch.zeros((B, H, W, D), dtype=torch.long)
        for h in range(H):
            for w in range(W):
                for d in range(D):
                    lg = ref.cached_forward(
                        xs[:, : h + 1], fake_vq, cond=torch.from_numpy(cond),
                        sample_loc=(h, w, d),
                    )
                    ref_logits[:, h, w, d, : lg.shape[-1]] = lg.numpy()
                    xs[:, h, w, d] = torch.from_numpy(forced[:, h, w, d])

    mine = S.forced_logits(
        params, tconf, forced, jnp.asarray(cond), vq_state, vq_config
    )
    # compare only each depth's VALID vocab slice: the zero-padding of
    # ref_logits beyond vocab_size[d] is finite while our side masks the
    # tail to -inf (classifier_apply heterogeneous mask)
    valid = np.zeros(ref_logits.shape, bool)
    for d in range(D):
        valid[..., d, : tconf.vocab_size[d]] = True
    valid &= np.isfinite(ref_logits)
    err = np.abs(mine[valid] - ref_logits[valid]).max()
    scale = np.abs(ref_logits[valid]).max() + 1e-8
    print(f"stage-2 forced-code logits: max abs err {err:.5f} (rel {err/scale:.5f})")
    ok = err / scale < 0.01
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
