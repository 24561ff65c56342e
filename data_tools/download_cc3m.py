"""CC-3M downloader: fetch images from the Google Conceptual Captions TSVs
and emit the {split}_list.txt files the Cc3m dataset reads.

Equivalent of /root/reference/data/cc3m/download_cc3m.py: a process pool
fetches URLs from the official train/val TSVs (caption \t url per line),
saves images under <out>/images/, and writes tab-separated
(relative_image_path, caption) rows for successful downloads.

Usage:
  python data_tools/download_cc3m.py --tsv Train_GCC-training.tsv \
      --out data/cc3m --split train --workers 64
"""

from __future__ import annotations

import argparse
import io
import os
from multiprocessing import Pool


def fetch_one(args):
    idx, caption, url, out_dir = args
    rel = f"images/{idx // 10000:04d}/{idx:08d}.jpg"
    path = os.path.join(out_dir, rel)
    if os.path.exists(path):
        return rel, caption
    try:
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": "cc3m-fetch"})
        with urllib.request.urlopen(req, timeout=10) as r:
            data = r.read()
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        img.save(path, "JPEG", quality=95)
        return rel, caption
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True, help="GCC tsv: caption<TAB>url per line")
    p.add_argument("--out", default="data/cc3m")
    p.add_argument("--split", default="train", choices=["train", "val"])
    p.add_argument("--workers", type=int, default=32)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    jobs = []
    with open(args.tsv) as f:
        for idx, line in enumerate(f):
            if args.limit and idx >= args.limit:
                break
            caption, url = line.rstrip("\n").split("\t")[:2]
            jobs.append((idx, caption, url, args.out))

    os.makedirs(args.out, exist_ok=True)
    ok = 0
    with Pool(args.workers) as pool, open(
        os.path.join(args.out, f"{args.split}_list.txt"), "w"
    ) as out:
        for res in pool.imap_unordered(fetch_one, jobs, chunksize=16):
            if res is not None:
                rel, caption = res
                out.write(f"{rel}\t{caption}\n")
                ok += 1
                if ok % 1000 == 0:
                    print(f"{ok}/{len(jobs)} downloaded", flush=True)
    print(f"done: {ok}/{len(jobs)} images")


if __name__ == "__main__":
    main()
