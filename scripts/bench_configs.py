"""Measure single-chip step throughput for every experiment config
(BASELINE.json:7-11 shapes, synthetic feed, batches resident on device) and
print a markdown-ready table for BASELINE.md — including an MFU estimate
from XLA's own cost analysis (program FLOPs / wall-time / chip peak)."""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 MXU peak per chip; v5e = 197 TFLOP/s (override for other chips).
PEAK_FLOPS = float(os.environ.get("SSTPU_PEAK_FLOPS", 197e12))


def program_flops(step, state, args):
    """FLOPs of the compiled step from XLA cost analysis (None if the
    backend doesn't expose it)."""
    try:
        ca = step.lower(state, *args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

# (config, per-chip labeled batch, per-chip unlabeled batch)
RUNS = [
    ("configs/1_supervised_unet_r18_128.yaml", 32, 0),
    ("configs/2_mean_teacher_unet_voc_256.yaml", 16, 16),
    ("configs/3_fixmatch_dlv3p_r50_voc_512.yaml", 8, 8),
    ("configs/4_cps_dlv3p_r101_cityscapes_768.yaml", 2, 2),
    ("configs/5_hrnet_w48_1024_full_ssl.yaml", 2, 2),
]
ITERS = 10


def batch(b, crop, num_classes, labeled, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray((rng.rand(b, crop, crop, 3) * 255).astype(np.uint8)),
        "label": jnp.asarray(
            rng.randint(0, num_classes, (b, crop, crop)).astype(np.int32)
            if labeled
            else np.full((b, crop, crop), 255, np.int32)
        ),
        "size": jnp.asarray(np.full((b, 2), crop, np.int32)),
    }


def main():
    print("| config | per-chip batch | ms/step | img/s/chip | est. MFU |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for path, bl, bu in RUNS:
        cfg = load_config(path)
        cfg = update_config(
            cfg,
            {
                "data.dataset": "synthetic",
                "train.labeled_batch_size": bl,
                "train.unlabeled_batch_size": max(bu, 1),
                "model.pretrained": "",
            },
        )
        crop, nc = cfg.data.crop_size, cfg.data.num_classes
        model = build_model(cfg)
        method = get_method(cfg.method.name)
        state = method.init_state(cfg, model, jax.random.key(0), 1000)
        step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
        lab = batch(bl, crop, nc, True)
        args = (lab, batch(bu, crop, nc, False, seed=1)) if method.uses_unlabeled else (lab,)
        flops = program_flops(step, state, args)
        state, m = step(state, *args)
        state, m = step(state, *args)
        # Materialize in warmup: pays the relay's one-time first-result
        # cost (~74 s on the CPS config) outside the timed window.
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, *args)
        # Materialize the loss VALUE: on the axon-relayed backend
        # block_until_ready (scalar or full tree) can return before the
        # enqueued programs drain, under-reporting large steps by >5x
        # (see scripts/profiler.py step).  device_get cannot lie.
        float(m["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        n_img = bl + (bu if method.uses_unlabeled else 0)
        mfu = f"{flops / dt / PEAK_FLOPS:.1%}" if flops else "n/a"
        print(
            f"| {cfg.name} | {bl}+{bu if method.uses_unlabeled else 0} @ {crop}² "
            f"| {dt * 1e3:.1f} | {n_img / dt:.1f} | {mfu} |",
            flush=True,
        )
        del state, step, lab, args, m


if __name__ == "__main__":
    main()
