"""Generate the reference models' EXACT state_dict key manifests for every
published config, as committed text fixtures (VERDICT r2 missing #4).

The released checkpoint zips are unreachable here (zero egress), but their
state_dict key sets are fully determined by the reference model code +
the published YAML configs — both of which we have. This tool instantiates
the reference torch models (on the meta device: no weight memory, so even
the 3.8B config costs nothing) from every YAML under
/root/reference/configs and writes sorted `key\tshape` manifests to
tests/goldens/key_manifests/. tests/test_key_manifests.py then audits our
converter against every manifest: a zeros state_dict with exactly those
keys/shapes must convert into a pytree structurally identical to our own
init — closing the "does the converter cover the real released key sets"
doubt without the real files.

Run from the repo root: python tools/gen_key_manifests.py
"""

import glob
import os
import sys

import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

OUT = os.path.join(ROOT, "tests", "goldens", "key_manifests")


def manifest_name(path: str) -> str:
    rel = path.split("configs/")[-1]
    return rel.replace("/", "__").replace(".yaml", "") + ".txt"


def ref_stage1_model(cfg):
    """Reference-format RQVAE (encoder/decoder/quantizer/quant convs) from a
    published stage-1 config, on the meta device."""
    from ref_loader import load_rqvae_modules

    _, M, Q = load_rqvae_modules()
    hp = cfg.arch.hparams
    dd = {k: v for k, v in cfg.arch.ddconfig.to_dict().items()}

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

    return RefRQVAE()


def resolve_stage2_config(path):
    """Load a published stage-2 YAML through the full augment_defaults path
    (which pulls dataset vocab sizes into the arch, exactly like training
    would with the stage-1 checkpoint's config.yaml beside it)."""
    import tempfile

    from rqvae_tpu.utils import config as C

    stage1 = C.load_config(
        "/root/reference/configs/imagenet256/stage1/in256-rqvae-8x8x4.yaml"
    )
    cfg = C.load_config(path)
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "config.yaml"), "w") as f:
            f.write(stage1.to_yaml())
        open(os.path.join(td, "model.pt"), "wb").close()
        cfg.vqvae = {"ckpt": os.path.join(td, "model.pt")}
        return C.augment_defaults(cfg)


def ref_stage2_model(cfg):
    """Reference RQTransformer from a published stage-2 config (meta
    device)."""
    from test_rqtransformer_parity import make_ref_config
    from ref_loader import load_rqtransformer_modules

    _, _, _, T = load_rqtransformer_modules()
    return T.RQTransformer(make_ref_config(T, cfg.arch.to_dict()))


def write_manifest(path, model):
    sd = model.state_dict()
    lines = sorted(
        f"{k}\t{tuple(v.shape)}" for k, v in sd.items()
    )
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, manifest_name(path)), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{manifest_name(path)}: {len(lines)} keys", flush=True)


def main():
    from rqvae_tpu.utils import config as C

    stage1 = sorted(glob.glob("/root/reference/configs/*/stage1/*.yaml"))
    stage2 = sorted(
        glob.glob("/root/reference/configs/*/stage2/*.yaml")
        + glob.glob("/root/reference/configs/cc3m/*.yaml")
    )
    cfgs2 = [resolve_stage2_config(p) for p in stage2]
    with torch.device("meta"):
        for p in stage1:
            write_manifest(p, ref_stage1_model(C.load_config(p)))
        for p, cfg in zip(stage2, cfgs2):
            write_manifest(p, ref_stage2_model(cfg))


if __name__ == "__main__":
    main()
