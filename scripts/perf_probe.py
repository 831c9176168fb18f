"""Measure TPU step-time of bench-config variants to locate the hot spots.

Variants: full fixmatch step (matmul aug vs gather aug), supervised-only
step, aug-only, teacher-forward-only.  One process, sequential compiles.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict, update_config
from semi_supervised_semantic_segmentation_tpu.methods import common, get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

CROP = 512
B = 8
ITERS = 10


def make_cfg(method="fixmatch_cutmix", aug_impl="matmul"):
    return config_from_dict(
        {
            "name": "probe",
            "data": {
                "dataset": "synthetic", "num_classes": 21, "crop_size": CROP,
                "split": "1_4", "aug_impl": aug_impl,
            },
            "model": {
                "backbone": "resnet50", "decoder": "deeplabv3plus",
                "output_stride": 16, "compute_dtype": "bfloat16",
            },
            "method": {"name": method},
            "train": {"labeled_batch_size": B, "unlabeled_batch_size": B, "epochs": 1},
        }
    )


rng = np.random.RandomState(0)


def mk(labeled):
    return {
        "image": jnp.asarray((rng.rand(B, CROP, CROP, 3) * 255).astype(np.uint8)),
        "label": jnp.asarray(
            rng.randint(0, 21, (B, CROP, CROP)).astype(np.int32)
            if labeled
            else np.full((B, CROP, CROP), 255, np.int32)
        ),
        "size": jnp.asarray(np.full((B, 2), CROP, np.int32)),
    }


lab, unlab = mk(True), mk(False)


def bench_step(name, cfg, method_name):
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    if method.uses_unlabeled:
        args = (lab, unlab)
    else:
        args = (lab,)
    state, m = step(state, *args)
    state, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    n_img = 2 * B if method.uses_unlabeled else B
    print(f"{name}: {dt * 1e3:.1f} ms/step  {n_img / dt:.1f} img/s", flush=True)
    return dt


def bench_fn(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


cfg = make_cfg()
key = jax.random.key(1)

bench_fn("weak_aug_matmul", lambda b, k: common.weak_view(cfg, b, k), lab, key)
cfg_g = make_cfg(aug_impl="gather")
bench_fn("weak_aug_gather", lambda b, k: common.weak_view(cfg_g, b, k), lab, key)
x01 = jnp.zeros((B, CROP, CROP, 3), jnp.float32)
bench_fn("strong_aug", lambda x, k: common.strong_view(cfg, x, k), x01, key)

model = build_model(cfg)
variables = jax.jit(
    lambda r, xx: model.init({"params": r}, xx, train=False)
)(jax.random.key(0), jnp.zeros((1, CROP, CROP, 3), jnp.bfloat16))
xb = jnp.zeros((B, CROP, CROP, 3), jnp.bfloat16)
bench_fn(
    "teacher_fwd(8)",
    lambda p, x: common.apply_eval(model, p, variables["batch_stats"], x),
    variables["params"], xb,
)

bench_step("supervised_step(8)", make_cfg("supervised"), "supervised")
bench_step("fixmatch_matmul(8+8)", make_cfg(), "fixmatch_cutmix")
bench_step("fixmatch_gather(8+8)", make_cfg(aug_impl="gather"), "fixmatch_cutmix")
