"""Metrics over a directory of samples*.pkl.

Mirror of /root/reference/compute_metrics.py:24-66: FID vs precomputed
dataset stats, IS for imagenet, CLIP score for cc3m/coco.

Usage:
  python cli/compute_metrics.py fake_path=<dir> ref_stat_path=<npz> \
      dataset=imagenet [clip_dataset_root=data/cc3m]
"""

from __future__ import annotations

import logging
import sys


def parse_kv(argv):
    out = {}
    for a in argv:
        k, v = a.split("=", 1)
        out[k] = v
    return out


def main():
    logging.basicConfig(level=logging.INFO)
    kv = parse_kv(sys.argv[1:])
    fake_path = kv["fake_path"]
    dataset = kv.get("dataset", "imagenet")

    from rqvae_tpu.metrics import fid as fid_lib
    from rqvae_tpu.metrics import is_score as is_lib

    extractor = fid_lib.InceptionExtractor()
    results = {}
    if "ref_stat_path" in kv:
        results["FID"] = fid_lib.compute_fid(fake_path, kv["ref_stat_path"])
    if dataset == "imagenet":
        m, s = is_lib.compute_inception_score_from_files(fake_path, extractor=extractor)
        results["IS"] = m
        results["IS_std"] = s
    if dataset in ("cc3m", "coco"):
        from rqvae_tpu.metrics.clip_score import compute_clip_score

        results["CLIP_score"] = compute_clip_score(
            fake_path,
            dataset_name=dataset,
            dataset_root=kv.get("clip_dataset_root"),
            split=kv.get("split", "val"),
        )
    for k, v in results.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
