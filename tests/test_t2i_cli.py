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
        env.update({"SMOKE_TEST": "1", "RQVAE_TPU_CPU": "1"})
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
