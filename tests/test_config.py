"""Config-system tests: reference YAML files must load unmodified."""

import glob

import pytest

from rqvae_tpu.utils import config as C

REF_STAGE1 = sorted(glob.glob("/root/reference/configs/*/stage1/*.yaml"))


def test_merge_and_dotlist():
    base = C.Config({"a": {"b": 1, "c": [1, 2]}, "d": "x"})
    over = C.from_dotlist(["a.b=5", "a.c=[3,4]", "e.f=true"])
    merged = C.merge(base, over)
    assert merged.a.b == 5
    assert merged.a.c == [3, 4]
    assert merged.e.f is True
    assert merged.d == "x"


@pytest.mark.parametrize("path", REF_STAGE1)
def test_reference_stage1_configs_load(path):
    cfg = C.load_config(path)
    cfg = C.augment_defaults(cfg)
    assert cfg.arch.type == "rq-vae"
    assert cfg.arch.hparams.bottleneck_type == "rq"
    assert len(cfg.arch.hparams.code_shape) == 3
    # reference defaults landed
    assert "restart_unused_codes" in cfg.arch.hparams
    assert cfg.experiment.test_freq is not None
    assert cfg.gan.disc.optimizer.type is not None


def test_stage2_config_pulls_stage1(tmp_path):
    # fake a stage-1 ckpt dir with config.yaml next to the .pt
    stage1 = C.load_config(
        "/root/reference/configs/imagenet256/stage1/in256-rqvae-8x8x4.yaml"
    )
    (tmp_path / "config.yaml").write_text(stage1.to_yaml())
    ckpt = tmp_path / "model.pt"
    ckpt.write_bytes(b"")

    cfg = C.load_config(
        "/root/reference/configs/imagenet256/stage2/in256-rqtransformer-8x8x4-480M.yaml"
    )
    cfg.vqvae = {"ckpt": str(ckpt)}
    cfg = C.augment_defaults(cfg)
    assert cfg.vqvae.type == "rq-vae"
    assert cfg.arch.vocab_size == 16384
    assert cfg.arch.body.block.embed_dim == cfg.arch.embed_dim
    assert cfg.arch.head.block.embed_dim == cfg.arch.embed_dim
    assert cfg.loss.temp == 0.5
    assert cfg.loss.stochastic_codes is True


def test_grad_accum_math():
    cfg = C.Config(
        {
            "arch": {"type": "rq-vae", "hparams": {}},
            "optimizer": {"warmup": {"epoch": 0}},
            "experiment": {"batch_size": 32, "total_batch_size": 2048},
        }
    )
    cfg = C.augment_defaults(cfg)
    cfg = C.augment_dist_defaults(cfg, num_devices=8)
    assert cfg.optimizer.grad_accm_steps == 2048 // (8 * 32)
    assert cfg.experiment.total_batch_size == 2048


REF_STAGE2 = sorted(
    glob.glob("/root/reference/configs/*/stage2/*.yaml")
    + glob.glob("/root/reference/configs/cc3m/*.yaml")
)


@pytest.mark.parametrize("path", REF_STAGE2, ids=[p.split("configs/")[-1] for p in REF_STAGE2])
def test_all_reference_stage2_configs_build_transformer(tmp_path, path):
    """Every reference stage-2 YAML must produce a valid TransformerConfig
    (and a consistent param pytree shape-wise)."""
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig

    stage1 = C.load_config(
        "/root/reference/configs/imagenet256/stage1/in256-rqvae-8x8x4.yaml"
    )
    (tmp_path / "config.yaml").write_text(stage1.to_yaml())
    (tmp_path / "model.pt").write_bytes(b"")

    cfg = C.load_config(path)
    cfg.vqvae = {"ckpt": str(tmp_path / "model.pt")}
    cfg = C.augment_defaults(cfg)
    tconf = TransformerConfig.create(cfg.arch.to_dict())
    assert tconf.embed_dim == cfg.arch.embed_dim
    assert tconf.body.n_layer == cfg.arch.body.n_layer
    assert tconf.vocab_size[0] == cfg.dataset.vocab_size
    # text configs carry a cond prefix
    if cfg.arch.block_size_cond and cfg.arch.block_size_cond > 1:
        assert tconf.vocab_size_cond == cfg.dataset.vocab_size_txt
