#!/usr/bin/env python
"""Training entry point (rebuilds the reference's train.py CLI, L7).

Usage:
  python train.py --config configs/1_supervised_unet_r18_128.yaml
  python train.py --config ... --set optim.lr=0.02 train.epochs=2
  python train.py --config ... --resume auto
"""

import argparse
import os

# Honor an explicit platform request before any backend initializes (the
# axon sitecustomize pins jax_platforms, so the env var alone is not enough).
if os.environ.get("SSTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SSTPU_PLATFORM"])

import yaml

from semi_supervised_semantic_segmentation_tpu.config import load_config
from semi_supervised_semantic_segmentation_tpu.engine.trainer import Trainer


def parse_overrides(pairs):
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"override must be key=value, got: {pair}")
        k, v = pair.split("=", 1)
        parsed = yaml.safe_load(v)
        # YAML 1.1 reads '1_16' as 116 (underscore thousands separator);
        # keep such values as the literal string (split names etc.).
        if isinstance(parsed, int) and "_" in v:
            parsed = v
        out[k] = parsed
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument(
        "--set", nargs="*", default=[], metavar="KEY=VALUE",
        help="dotted config overrides, e.g. optim.lr=0.02",
    )
    p.add_argument("--resume", default=None, help="'auto', ckpt dir, or dir:step")
    p.add_argument("--work_dir", default=None)
    p.add_argument(
        "--init_from_torch", default=None, metavar="CKPT.pth",
        help="initialize weights from a reference-layout torch checkpoint",
    )
    args = p.parse_args()

    overrides = parse_overrides(args.set)
    if args.resume is not None:
        overrides["train.resume"] = args.resume
    if args.work_dir is not None:
        overrides["train.work_dir"] = args.work_dir
    if args.init_from_torch is not None:
        overrides["train.init_from_torch"] = args.init_from_torch
    cfg = load_config(args.config, overrides)
    from semi_supervised_semantic_segmentation_tpu.parallel import distributed

    distributed.maybe_initialize()
    best = Trainer(cfg).fit()
    print(f"best mIoU: {best:.4f}")


if __name__ == "__main__":
    main()
