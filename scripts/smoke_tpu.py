"""TPU smoke (SURVEY §4.2): compile + run one train step of every config's
(model, method) pair at reduced batch/crop on the real chip, assert shapes
and no recompile on the second call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/smoke_tpu.py
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

CONFIGS = [
    "configs/1_supervised_unet_r18_128.yaml",
    "configs/2_mean_teacher_unet_voc_256.yaml",
    "configs/3_fixmatch_dlv3p_r50_voc_512.yaml",
    "configs/4_cps_dlv3p_r101_cityscapes_768.yaml",
    "configs/5_hrnet_w48_1024_full_ssl.yaml",
]

B = 2
CROP = 128


def batch(labeled, num_classes):
    rng = np.random.RandomState(0)
    return {
        "image": (rng.rand(B, CROP, CROP, 3) * 255).astype(np.uint8),
        "label": (
            rng.randint(0, num_classes, (B, CROP, CROP)).astype(np.int32)
            if labeled
            else np.full((B, CROP, CROP), 255, np.int32)
        ),
        "size": np.full((B, 2), CROP, np.int32),
    }


def main():
    print("devices:", jax.devices(), flush=True)
    for path in CONFIGS:
        cfg = load_config(path)
        cfg = update_config(
            cfg,
            {
                "data.crop_size": CROP,
                "data.dataset": "synthetic",
                "train.labeled_batch_size": B,
                "train.unlabeled_batch_size": B,
                "model.pretrained": "",
            },
        )
        model = build_model(cfg)
        method = get_method(cfg.method.name)
        t0 = time.perf_counter()
        state = method.init_state(cfg, model, jax.random.key(0), 100)
        step = jax.jit(method.make_train_step(cfg, model, 100), donate_argnums=0)
        lab = batch(True, cfg.data.num_classes)
        args = (lab, batch(False, cfg.data.num_classes)) if method.uses_unlabeled else (lab,)
        state, m = step(state, *args)
        jax.block_until_ready(m["loss"])
        t1 = time.perf_counter()
        state, m = step(state, *args)
        jax.block_until_ready(m["loss"])
        t2 = time.perf_counter()
        assert np.isfinite(float(m["loss"]))
        assert int(jax.device_get(state.step)) == 2
        # No-recompile assertion: the second call must be >10x faster than
        # the compile call.
        assert (t2 - t1) < (t1 - t0) / 10, (path, t1 - t0, t2 - t1)
        print(
            f"{cfg.name}: OK compile+step {t1 - t0:.1f}s, step {(t2 - t1) * 1e3:.0f}ms, "
            f"loss={float(m['loss']):.3f}",
            flush=True,
        )
    print("TPU smoke: all configs OK")


if __name__ == "__main__":
    main()
