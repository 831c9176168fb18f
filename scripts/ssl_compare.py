#!/usr/bin/env python
"""SSL-vs-supervised comparison on the gapped-blobs fixture (VERDICT r1
item 10; BASELINE.md SSL-comparison table).

The gapped fixture (data.synthetic_gapped) draws LABELED blob appearances
from a narrow slice of the hue continuum while unlabeled/val span the full
range, so pseudo-labeling has a real distribution gap to exploit — unlike
the legacy corpus, where 4 labeled images already cover everything.

Usage (TPU or CPU):
  python scripts/ssl_compare.py [--epochs 16] [--size 64] [--crop 96]
Prints one JSON line per method and a final comparison line.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict


def run(method: str, args) -> float:
    from semi_supervised_semantic_segmentation_tpu.engine.trainer import Trainer

    cfg = config_from_dict(
        {
            "name": f"ssl_compare_{method}",
            "data": {
                "dataset": "synthetic",
                "split": "1_16",
                "num_classes": 4,
                "crop_size": args.crop,
                "synthetic_size": args.size,
                "synthetic_gapped": True,
                "num_workers": 2,
            },
            "model": {
                "backbone": "resnet18",
                "decoder": "unet",
                "output_stride": 32,
                "compute_dtype": args.dtype,
            },
            "method": {
                "name": method,
                "conf_thresh": 0.9,
                "ema_alpha": 0.99,
                "rampup_iters": args.epochs * 4,
            },
            "optim": {"lr": 0.02},
            "train": {
                "epochs": args.epochs,
                "labeled_batch_size": 8,
                "unlabeled_batch_size": 8,
                "eval_batch_size": 8,
                "eval_interval": max(args.epochs // 4, 1),
                "log_interval": 1000,
                "work_dir": f"/tmp/ssl_compare/{method}",
                "checkpoint_interval": 10**9,
                "seed": args.seed,
            },
        }
    )
    best = Trainer(cfg).fit()
    print(json.dumps({"method": method, "best_miou": round(best, 4)}))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--methods", nargs="*",
                   default=["supervised", "fixmatch_cutmix"])
    args = p.parse_args()
    scores = {m: run(m, args) for m in args.methods}
    base = scores.get("supervised")
    print(json.dumps({"scores": scores,
                      "ssl_gain": {m: round(v - base, 4) for m, v in scores.items()
                                   if m != "supervised" and base is not None}}))


if __name__ == "__main__":
    main()
