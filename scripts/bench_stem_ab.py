"""Whole-step A/B of the pallas stem kernel (ops/pallas_stem.py) on the
real chip: run a config's full SSL train step with model.stem_impl=conv
vs =pallas IN THE SAME SESSION and report ms/step for each (float(loss)
timing per BASELINE.md methodology — block_until_ready is not a fence on
the axon relay).

Usage:
    python scripts/bench_stem_ab.py [--config N] [--iters I] [--bl B --bu B]

VERDICT r4 item 1: the round-4 stem kernel was correctness-tested but
never A/B'd in context; this script is the ship-or-kill gate.
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

CONFIGS = {
    2: ("configs/2_mean_teacher_unet_voc_256.yaml", 16, 16, 50),
    3: ("configs/3_fixmatch_dlv3p_r50_voc_512.yaml", 8, 8, 50),
}


def bench(path, bl, bu, iters, stem_impl):
    cfg = update_config(
        load_config(_os.path.join(REPO, path)),
        {
            "data.dataset": "synthetic",
            "train.labeled_batch_size": bl,
            "train.unlabeled_batch_size": max(bu, 1),
            "model.pretrained": "",
            "model.stem_impl": stem_impl,
        },
    )
    crop, nc = cfg.data.crop_size, cfg.data.num_classes
    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=1000)
    step = jax.jit(
        method.make_train_step(cfg, model, total_steps=1000), donate_argnums=0
    )
    rng = np.random.RandomState(0)

    def mk(batch, labeled):
        return {
            "image": (rng.rand(batch, crop, crop, 3) * 255).astype(np.uint8),
            "label": (
                rng.randint(0, nc, (batch, crop, crop)).astype(np.int32)
                if labeled
                else np.full((batch, crop, crop), 255, np.int32)
            ),
            "size": np.full((batch, 2), crop, np.int32),
        }

    lab = jax.device_put(mk(bl, True))
    args = (
        (lab, jax.device_put(mk(max(bu, 1), False)))
        if method.uses_unlabeled
        else (lab,)
    )
    for _ in range(3):
        state, metrics = step(state, *args)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *args)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    del state, step, lab, args, metrics
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3, choices=sorted(CONFIGS))
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--bl", type=int, default=0)
    ap.add_argument("--bu", type=int, default=0)
    ap.add_argument(
        "--legs", type=str, default="conv,pallas,conv,pallas",
        help="comma-separated stem impls to bench in order (e.g. 'conv' "
        "for a single leg when scanning env/XLA-flag variations)")
    args = ap.parse_args()
    path, bl, bu, iters = CONFIGS[args.config]
    bl, bu = args.bl or bl, args.bu or bu
    iters = args.iters or iters
    n_img = bl + bu

    for impl in args.legs.split(","):
        ms = bench(path, bl, bu, iters, impl)
        print(
            f"config {args.config} stem={impl:6s} {bl}+{bu}: "
            f"{ms:7.1f} ms/step  {n_img / ms * 1e3:7.2f} img/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
