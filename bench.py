#!/usr/bin/env python
"""Benchmark: images/sec/chip on the labeled+unlabeled SSL step at 512²
(BASELINE.json:2's primary metric; config-3 shape: DeepLabV3+ ResNet-50,
fixmatch_cutmix with on-device aug, EMA teacher, CutMix).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against ``bench_baseline.json`` (the first recorded
TPU measurement of this repo — the reference publishes no numbers,
BASELINE.json:13 ``published: {}``).  On the first TPU run the baseline file
is created with the measured value, so later rounds track speedups.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

CROP = 512
LABELED = 8
UNLABELED = 8
WARMUP = 3
ITERS = 50  # amortize the final device_get RTT (remote relay) to <1% of the window


def main():
    from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
    from semi_supervised_semantic_segmentation_tpu.methods import get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model
    from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib

    cfg = config_from_dict(
        {
            "name": "bench",
            "data": {
                "dataset": "synthetic",
                "num_classes": 21,
                "crop_size": CROP,
                "split": "1_4",
            },
            "model": {
                "backbone": "resnet50",
                "decoder": "deeplabv3plus",
                "output_stride": 16,
                "compute_dtype": "bfloat16",
            },
            "method": {"name": "fixmatch_cutmix", "conf_thresh": 0.95},
            "train": {
                "labeled_batch_size": LABELED,
                "unlabeled_batch_size": UNLABELED,
                "epochs": 1,
            },
        }
    )
    n_chips = len(jax.devices())
    mesh = mesh_lib.make_mesh()
    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=1000)
    state = mesh_lib.replicate(state, mesh)
    step = jax.jit(
        method.make_train_step(cfg, model, total_steps=1000), donate_argnums=0
    )

    rng = np.random.RandomState(0)
    canvas = CROP

    def mk(batch, labeled):
        return {
            "image": (rng.rand(batch, canvas, canvas, 3) * 255).astype(np.uint8),
            "label": (
                rng.randint(0, 21, (batch, canvas, canvas)).astype(np.int32)
                if labeled
                else np.full((batch, canvas, canvas), 255, np.int32)
            ),
            "size": np.full((batch, 2), canvas, np.int32),
        }

    lab = mesh_lib.shard_batch(mk(LABELED, True), mesh)
    unlab = mesh_lib.shard_batch(mk(UNLABELED, False), mesh)

    for _ in range(WARMUP):
        state, metrics = step(state, lab, unlab)
    float(metrics["loss"])  # materialize: warmup fully drained

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, lab, unlab)
    # Time to the VALUE of the final loss, not block_until_ready: on the
    # axon-relayed TPU backend block_until_ready (scalar or whole tree) can
    # return before the enqueued programs finish executing (observed >5x
    # under-reporting on the CPS config; profiler device time is the ground
    # truth and a device_get of the chained loss cannot return early).
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = (LABELED + UNLABELED) * ITERS / dt
    per_chip = images_per_sec / n_chips

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("images_per_sec_per_chip")
    platform = jax.devices()[0].platform
    if baseline is None and platform != "cpu":
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "images_per_sec_per_chip": per_chip,
                    "config": "dlv3p_r50_fixmatch_cutmix_512",
                    "platform": platform,
                    "note": "first recorded measurement of this repo (reference publishes none)",
                },
                f,
                indent=2,
            )
        baseline = per_chip

    vs = per_chip / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "images/sec/chip @512^2 labeled+unlabeled fixmatch_cutmix dlv3p_r50",
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
