"""Text-image datasets: CC-3M and MS-COCO captions.

Torch-free re-implementation of /root/reference/rqvae/txtimg_datasets/
cc3m.py:26-98 and coco.py:24-111. Items are (image array, token ids int32)
— or (0, ids) / raw strings for the *TextOnly/RawText eval variants.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from rqvae_tpu.data.tokenizers import create_tokenizer, prepare_tokenizer
from rqvae_tpu.data.transforms import Transform


class Cc3m:
    """{split}_list.txt with tab-separated (imgpath, text) rows."""

    splits = {"train", "val"}

    def __init__(
        self,
        root: str,
        split: str,
        tok_name: str,
        transform: Optional[Transform] = None,
        context_length: int = 77,
        dropout=None,
        seed: int = 0,
    ):
        assert split in self.splits
        self.root = root
        self.split = split
        self.transform = transform
        self.seed = seed
        self.tokenizer = prepare_tokenizer(
            create_tokenizer(tok_name, lowercase=True, dropout=dropout), context_length
        )
        self.items = []
        with open(f"{root}/{split}_list.txt") as f:
            for line in f:
                toks = line.strip().split("\t")
                assert len(toks) == 2
                imgpath, text = toks
                self.items.append((os.path.join(root, imgpath), text))

    def __len__(self):
        return len(self.items)

    def _encode(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text).ids, np.int32)

    def __getitem__(self, i: int):
        imgpath, text = self.items[i]
        img = Image.open(imgpath).convert("RGB")
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, i]))
        if self.transform:
            img = self.transform(img, rng)
        return img, self._encode(text)


class Cc3mTextOnly(Cc3m):
    def __getitem__(self, i: int):
        _, text = self.items[i]
        return 0, self._encode(text)


class Cc3mRawTextOnly:
    def __init__(self, root: str, split: str):
        self.items = []
        with open(f"{root}/{split}_list.txt") as f:
            for line in f:
                toks = line.strip().split("\t")
                assert len(toks) == 2
                self.items.append(toks[1])

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _CocoCaptions:
    """Minimal COCO captions reader (replaces torchvision CocoCaptions over
    annotations/captions_val2014_30K_samples.json)."""

    def __init__(self, img_root: str, ann_file: str):
        with open(ann_file) as f:
            ann = json.load(f)
        self.img_root = img_root
        images = {im["id"]: im["file_name"] for im in ann["images"]}
        caps: dict = {}
        for a in ann["annotations"]:
            caps.setdefault(a["image_id"], []).append(a["caption"])
        # torchvision iterates sorted image ids
        self.ids = sorted(images.keys())
        self.file_names = images
        self.captions = caps

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i: int):
        img_id = self.ids[i]
        img = Image.open(
            os.path.join(self.img_root, self.file_names[img_id])
        ).convert("RGB")
        return img, self.captions.get(img_id, [""])


class Coco:
    splits = {"val"}

    def __init__(
        self,
        root: str,
        split: str,
        tok_name: str,
        transform: Optional[Transform] = None,
        context_length: int = 77,
        dropout=None,
        seed: int = 0,
    ):
        assert split in self.splits
        self.split = split
        self.transform = transform
        self.seed = seed
        self.tokenizer = prepare_tokenizer(
            create_tokenizer(tok_name, lowercase=True, dropout=dropout), context_length
        )
        self.dataset = _CocoCaptions(
            f"{root}/images/val2014",
            f"{root}/annotations/captions_val2014_30K_samples.json",
        )

    def __len__(self):
        return len(self.dataset)

    def _encode(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text).ids, np.int32)

    def __getitem__(self, i: int):
        img, texts = self.dataset[i]
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, i]))
        if self.transform:
            img = self.transform(img, rng)
        if self.split == "train":
            text = texts[int(rng.integers(0, len(texts)))]
        else:
            text = texts[0]
        return img, self._encode(text)


class CocoTextOnly(Coco):
    def __getitem__(self, i: int):
        _, texts = self.dataset[i]
        return 0, self._encode(texts[0])


class CocoRawTextOnly:
    def __init__(self, root: str, split: str = "val"):
        self.dataset = _CocoCaptions(
            f"{root}/images/val2014",
            f"{root}/annotations/captions_val2014_30K_samples.json",
        )

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        return self.dataset.captions.get(self.dataset.ids[i], [""])[0]
