"""Bisect TPU compile time of the bench step's components."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
from semi_supervised_semantic_segmentation_tpu.methods import common, get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model
from semi_supervised_semantic_segmentation_tpu.ops import augment

CROP = 512
B = 8

cfg = config_from_dict(
    {
        "name": "bisect",
        "data": {"dataset": "synthetic", "num_classes": 21, "crop_size": CROP, "split": "1_4"},
        "model": {"backbone": "resnet50", "decoder": "deeplabv3plus", "output_stride": 16},
        "method": {"name": "fixmatch_cutmix"},
        "train": {"labeled_batch_size": B, "unlabeled_batch_size": B, "epochs": 1},
    }
)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name}: trace/lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s", flush=True)
    return compiled


rng = np.random.RandomState(0)
img_u8 = jnp.asarray((rng.rand(B, CROP, CROP, 3) * 255).astype(np.uint8))
lab = jnp.asarray(rng.randint(0, 21, (B, CROP, CROP)).astype(np.int32))
sizes = jnp.asarray(np.full((B, 2), CROP, np.int32))
key = jax.random.key(0)

timeit("weak_aug", lambda i, l, s, k: common.weak_view(cfg, {"image": i, "label": l, "size": s}, k), img_u8, lab, sizes, key)

x01 = jnp.zeros((B, CROP, CROP, 3), jnp.float32)
timeit("strong_aug", lambda x, k: common.strong_view(cfg, x, k), x01, key)

timeit("color_jitter_only", lambda x, k: jax.vmap(augment.color_jitter_single)(x, jax.random.split(k, B)), x01, key)
timeit("blur_only", lambda x: augment.gaussian_blur(x, jnp.full((B,), 1.0), 51), x01)

model = build_model(cfg)
xbf = jnp.zeros((2 * B, CROP, CROP, 3), jnp.bfloat16)
variables = model.init({"params": jax.random.key(0)}, xbf[:1], train=False)


def fwd_bwd(params, x):
    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    return jax.grad(loss)(params)


timeit("model_fwd_bwd", fwd_bwd, variables["params"], xbf)

method = get_method("fixmatch_cutmix")
state = method.init_state(cfg, model, jax.random.key(0), total_steps=100)
step = method.make_train_step(cfg, model, total_steps=100)
labb = {"image": img_u8, "label": lab, "size": sizes}
unlabb = {"image": img_u8, "label": jnp.full_like(lab, 255), "size": sizes}
timeit("full_step", step, state, labb, unlabb)
