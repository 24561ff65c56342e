"""Text-to-image sampling CLI end-to-end smoke (CPU subprocess).

Generates an EPHEMERAL tiny text-conditional stage-2 checkpoint (cc3m-style
arch: bpe16k cond vocab, 32-token prefix) against the committed stage-1
fixture, builds a synthetic cc3m caption set, and drives
cli/main_sampling_txt2img.py — exercising the tokenizer registry (real
vendored BPE assets), the text dataset, the text-conditioned sampler, and
the ordered sample dump (reference main_sampling_txt2img.py:77-212)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGE1 = os.path.join(REPO, "tests", "goldens", "synth_ckpt", "stage1", "model.pt")

pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def t2i_setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("t2i")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from gen_synthetic_ckpt import gen_t2i

    ckpt_dir = str(base / "ckpt")
    gen_t2i(ckpt_dir, STAGE1)

    # synthetic cc3m: {split}_list.txt of (imgpath \t caption)
    data_root = base / "cc3m"
    data_root.mkdir()
    captions = [
        "a dog in the park", "a red car on the street",
        "a bowl of fruit on a table", "two people walking on the beach",
    ]
    with open(data_root / "val_list.txt", "w") as f:
        for i, c in enumerate(captions):
            f.write(f"img_{i}.jpg\t{c}\n")
    return ckpt_dir, str(data_root)


class TestT2ICli:
    def test_txt2img_sampling_end_to_end(self, t2i_setup, tmp_path):
        ckpt_dir, data_root = t2i_setup
        out = str(tmp_path / "out")
        env = dict(os.environ)
        env.update({"SMOKE_TEST": "1", "RQVAE_TPU_CPU": "1", "XLA_FLAGS": ""})
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "main_sampling_txt2img.py"),
             "-m", os.path.join(ckpt_dir, "model.pt"),
             "--dataset-root", data_root, "-bs", "2", "-o", out,
             "--top-k", "8"],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=1200,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        pkls = [f for f in os.listdir(out) if f.startswith("samples")]
        assert pkls, os.listdir(out)
        with open(os.path.join(out, sorted(pkls)[0]), "rb") as f:
            arr = pickle.load(f)
        arr = np.asarray(arr)
        # NCHW float [0,1], 64px (stage-1 fixture resolution)
        assert arr.shape[1] == 3 and arr.shape[2] == 64
        assert 0.0 <= arr.min() and arr.max() <= 1.0

    def test_stage2_text_training_smoke(self, t2i_setup, tmp_path):
        """Full cc3m-style stage-2 TRAINING loop (text prefix + cond
        classifier + txt/img-weighted soft-target loss), one smoke epoch —
        the path the reference withholds entirely (README.md:214)."""
        ckpt_dir, data_root = t2i_setup
        # training config = fixture config + optimizer/experiment + data root
        cfg = open(os.path.join(ckpt_dir, "config.yaml")).read()
        cfg = cfg.replace(
            "dataset:\n  dataset: cc3m",
            f"dataset:\n  dataset: cc3m\n  root: {data_root}",
        )
        cfg += (
            "\noptimizer:\n  type: adamW\n  init_lr: 5.0e-4\n"
            "  weight_decay: 0.0001\n  betas: [0.9, 0.95]\n"
            "  warmup:\n    epoch: 0\n    multiplier: 1\n    buffer_epoch: 0\n"
            "    min_lr: 0.0\n    mode: fix\n    start_from_zero: True\n"
            "  max_gn: 1.0\n"
            "\nexperiment:\n  batch_size: 4\n  total_batch_size: 8\n"
            "  epochs: 1\n  save_ckpt_freq: 1\n  test_freq: 1\n"
        )
        # images for the training split exist beside the captions
        from PIL import Image
        import numpy as np

        rng = np.random.RandomState(0)
        for split in ("train", "val"):
            lines = []
            for i in range(4):
                fn = f"{split}_im_{i}.jpg"
                Image.fromarray(
                    rng.randint(0, 255, (80, 80, 3), np.uint8)
                ).save(os.path.join(data_root, fn))
                lines.append(f"{fn}\tcaption number {i}\n")
            with open(os.path.join(data_root, f"{split}_list.txt"), "w") as f:
                f.writelines(lines)

        cfg_path = str(tmp_path / "train_config.yaml")
        open(cfg_path, "w").write(cfg)
        # single CPU device (pytest's conftest XLA_FLAGS would give the
        # subprocess 8 virtual devices and break the batch-size math)
        env = dict(os.environ)
        env.update({"SMOKE_TEST": "1", "RQVAE_TPU_CPU": "1", "XLA_FLAGS": ""})
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "main_stage2.py"),
             "-m", cfg_path, "-r", str(tmp_path / "out")],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=1200,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        log = r.stdout + r.stderr
        assert "loss_txt" in log and "checkpoint saved" in log, log[-1500:]


def test_measure_throughput_650m_text_geometry():
    """cli/measure_throughput.py builds the cc3m 650M text-conditional
    geometry (configs/cc3m/cc3m-rqtransformer-8x8x4-650M.yaml: embed 1280,
    body 26 / head 4 @ nh20, 32-token cond prefix over a 16384 BPE vocab)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "measure_throughput", os.path.join(REPO, "cli", "measure_throughput.py")
    )
    mt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mt)

    _, tconf = mt.build(32, "650M", 4, 16384, cond_len=32, vocab_cond=16384)
    assert tconf.embed_dim == 1280
    assert tconf.body.n_layer == 26 and tconf.body.n_head == 20
    assert tconf.head.n_layer == 4
    assert tconf.block_size_cond == 32
    assert tconf.vocab_size_cond == 16384


def test_measure_throughput_zoo_matches_reference():
    """The model zoo geometries are pinned to the reference's exact numbers
    (reference measure_throughput/__main__.py:69-211): embed/nh/body/head for
    huge/large/medium/small at d=4 and d=1, plus the f16-d1-locked
    vqgan_large/vqgan_huge variants and their geometry guards."""
    import importlib.util

    import pytest

    spec = importlib.util.spec_from_file_location(
        "measure_throughput", os.path.join(REPO, "cli", "measure_throughput.py")
    )
    mt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mt)

    # (model, f, d) -> (embed, nh, body, head); reference line cited per row
    expect = {
        ("huge", 32, 4): (1536, 24, 42, 6),      # :70-92
        ("huge", 16, 1): (1536, 24, 48, 0),
        ("large", 32, 4): (1536, 24, 24, 4),     # :94-116
        ("large", 16, 1): (1536, 24, 28, 0),
        ("medium", 32, 4): (1024, 16, 24, 4),    # :118-140
        ("medium", 16, 1): (1024, 16, 28, 0),
        ("small", 32, 4): (512, 8, 24, 4),       # :142-164
        ("small", 16, 1): (512, 8, 28, 0),
        ("vqgan_large", 16, 1): (1664, 16, 24, 0),  # :166-188 (c1024)
        ("vqgan_huge", 16, 1): (1536, 24, 48, 0),   # :190-211 (c16384)
    }
    for (name, f, d), (embed, nh, body, head) in expect.items():
        c = 1024 if name == "vqgan_large" else 16384
        _, tconf = mt.build(f, name, d, c)
        assert tconf.embed_dim == embed, (name, f, d)
        assert tconf.body.n_head == nh, (name, f, d)
        assert tconf.body.n_layer == body, (name, f, d)
        assert tconf.head.n_layer == head, (name, f, d)
        assert tuple(tconf.block_size)[:2] == ({32: (8, 8), 16: (16, 16)}[f])

    # the reference raises on any other geometry for the vqgan variants
    with pytest.raises(ValueError):
        mt.build(32, "vqgan_large", 1, 1024)   # wrong f
    with pytest.raises(ValueError):
        mt.build(16, "vqgan_large", 4, 1024)   # wrong depth
    with pytest.raises(ValueError):
        mt.build(16, "vqgan_huge", 1, 1024)    # wrong codebook
