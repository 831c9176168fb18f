"""Batch-scaling probe + profile capture for the bench step."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

CROP = 512
ITERS = 10


def make_cfg(b):
    return config_from_dict(
        {
            "name": "probe2",
            "data": {"dataset": "synthetic", "num_classes": 21, "crop_size": CROP, "split": "1_4"},
            "model": {"backbone": "resnet50", "decoder": "deeplabv3plus", "output_stride": 16},
            "method": {"name": "fixmatch_cutmix"},
            "train": {"labeled_batch_size": b, "unlabeled_batch_size": b, "epochs": 1},
        }
    )


rng = np.random.RandomState(0)


def mk(b, labeled):
    return {
        "image": jnp.asarray((rng.rand(b, CROP, CROP, 3) * 255).astype(np.uint8)),
        "label": jnp.asarray(
            rng.randint(0, 21, (b, CROP, CROP)).astype(np.int32)
            if labeled
            else np.full((b, CROP, CROP), 255, np.int32)
        ),
        "size": jnp.asarray(np.full((b, 2), CROP, np.int32)),
    }


def run(b, profile=False):
    cfg = make_cfg(b)
    model = build_model(cfg)
    method = get_method("fixmatch_cutmix")
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab, unlab = mk(b, True), mk(b, False)
    state, m = step(state, lab, unlab)
    state, m = step(state, lab, unlab)
    jax.block_until_ready(m["loss"])
    if profile:
        jax.profiler.start_trace("/tmp/sstpu_profile")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, lab, unlab)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    if profile:
        jax.profiler.stop_trace()
    print(f"b={b}+{b}: {dt * 1e3:.1f} ms/step  {2 * b / dt:.1f} img/s", flush=True)


run(4)
run(8)
run(16, profile=True)
print("profile written to /tmp/sstpu_profile", flush=True)
