"""Shared test fixtures: tiny configs + synthetic batches."""

from __future__ import annotations

import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import Config, config_from_dict


def tiny_cfg(method: str = "supervised", crop: int = 64, **overrides) -> Config:
    raw = {
        "name": f"test_{method}",
        "data": {
            "dataset": "synthetic",
            "split": "1_4",
            "num_classes": 4,
            "crop_size": crop,
            "synthetic_size": 16,
            "num_workers": 2,
        },
        "model": {
            "backbone": "resnet18",
            "decoder": "unet",
            "output_stride": 32,
            "compute_dtype": "float32",
        },
        "method": {"name": method},
        "optim": {"lr": 0.01},
        "train": {
            "epochs": 1,
            "labeled_batch_size": 8,
            "unlabeled_batch_size": 8,
            "eval_batch_size": 8,
            "log_interval": 100,
            "work_dir": "/tmp/sstpu_test",
        },
    }
    for dotted, v in overrides.items():
        node = raw
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return config_from_dict(raw)


def synthetic_batch(batch: int, canvas: int, num_classes: int = 4, seed: int = 0,
                    labeled: bool = True):
    rng = np.random.RandomState(seed)
    image = (rng.rand(batch, canvas, canvas, 3) * 255).astype(np.uint8)
    if labeled:
        label = rng.randint(0, num_classes, (batch, canvas, canvas)).astype(np.int32)
    else:
        label = np.full((batch, canvas, canvas), 255, dtype=np.int32)
    size = np.full((batch, 2), canvas, dtype=np.int32)
    return {"image": image, "label": label, "size": size}
