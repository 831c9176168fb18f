"""TPU perf probe for the bench step (consolidates the round-1 probe pair).

Modes:
  python scripts/perf_probe.py               # component probes (aug cores,
                                             # teacher fwd, per-method steps)
  python scripts/perf_probe.py --scale       # batch scaling 4/8/16 (+trace)
  python scripts/perf_probe.py --cutmix      # XLA vs Pallas fused CutMix
  python scripts/perf_probe.py --profile     # trace ITERS steps to /tmp
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
from semi_supervised_semantic_segmentation_tpu.methods import common, get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

CROP = 512
B = 8
ITERS = 10


def make_cfg(method="fixmatch_cutmix", aug_impl="matmul", b=B, cutmix_impl="xla"):
    return config_from_dict(
        {
            "name": "probe",
            "data": {
                "dataset": "synthetic", "num_classes": 21, "crop_size": CROP,
                "split": "1_4", "aug_impl": aug_impl, "cutmix_impl": cutmix_impl,
            },
            "model": {
                "backbone": "resnet50", "decoder": "deeplabv3plus",
                "output_stride": 16, "compute_dtype": "bfloat16",
            },
            "method": {"name": method},
            "train": {"labeled_batch_size": b, "unlabeled_batch_size": b, "epochs": 1},
        }
    )


rng = np.random.RandomState(0)


def mk(labeled, b=B):
    return {
        "image": jnp.asarray((rng.rand(b, CROP, CROP, 3) * 255).astype(np.uint8)),
        "label": jnp.asarray(
            rng.randint(0, 21, (b, CROP, CROP)).astype(np.int32)
            if labeled
            else np.full((b, CROP, CROP), 255, np.int32)
        ),
        "size": jnp.asarray(np.full((b, 2), CROP, np.int32)),
    }


def bench_step(name, cfg, method_name, b=B, profile=False):
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab, unlab = mk(True, b), mk(False, b)
    args = (lab, unlab) if method.uses_unlabeled else (lab,)
    state, m = step(state, *args)
    state, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    if profile:
        jax.profiler.start_trace("/tmp/sstpu_profile")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    if profile:
        jax.profiler.stop_trace()
        print("profile written to /tmp/sstpu_profile", flush=True)
    n_img = 2 * b if method.uses_unlabeled else b
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


def components():
    cfg = make_cfg()
    key = jax.random.key(1)
    lab = mk(True)
    bench_fn("weak_aug_matmul", lambda b_, k: common.weak_view(cfg, b_, k), lab, key)
    cfg_g = make_cfg(aug_impl="gather")
    bench_fn("weak_aug_gather", lambda b_, k: common.weak_view(cfg_g, b_, k), lab, key)
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


def scale():
    for b in (4, 8, 16):
        bench_step(f"fixmatch(b={b}+{b})", make_cfg(b=b), "fixmatch_cutmix",
                   b=b, profile=(b == 16))


def cutmix():
    bench_step("fixmatch_cutmix_xla(8+8)", make_cfg(cutmix_impl="xla"),
               "fixmatch_cutmix")
    bench_step("fixmatch_cutmix_pallas(8+8)", make_cfg(cutmix_impl="pallas"),
               "fixmatch_cutmix")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scale", action="store_true")
    p.add_argument("--cutmix", action="store_true")
    p.add_argument("--profile", action="store_true")
    a = p.parse_args()
    if a.scale:
        scale()
    elif a.cutmix:
        cutmix()
    elif a.profile:
        bench_step("fixmatch(8+8)", make_cfg(), "fixmatch_cutmix", profile=True)
    else:
        components()
