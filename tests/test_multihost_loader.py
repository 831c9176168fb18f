"""Multi-host loader slicing semantics (host logic, no cluster needed):
per-process row-blocks of each global batch concatenate back to exactly the
single-process batch — the contract shard_batch's
make_array_from_process_local_data path relies on."""

import numpy as np

from semi_supervised_semantic_segmentation_tpu.data.datasets import SyntheticDataset
from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader


def test_process_blocks_reassemble_global_batch():
    ds = SyntheticDataset(num_classes=4, size=16, image_hw=(32, 32), seed=0)
    full = Loader(ds, 8, seed=3, num_workers=2)
    parts = [
        Loader(ds, 8, seed=3, num_workers=2, process_index=r, process_count=4)
        for r in range(4)
    ]
    for fb, *pbs in zip(full.epoch(0), *(p.epoch(0) for p in parts)):
        for key in ("image", "label", "size", "index"):
            merged = np.concatenate([pb[key] for pb in pbs], axis=0)
            np.testing.assert_array_equal(merged, fb[key])
        assert pbs[0]["image"].shape[0] == 2  # 8 global / 4 processes


def test_blank_pad_slices_consistently():
    ds = SyntheticDataset(num_classes=4, size=5, image_hw=(32, 32), seed=0)
    full = Loader(ds, 4, shuffle=False, drop_last=False, pad_mode="blank", num_workers=1)
    parts = [
        Loader(ds, 4, shuffle=False, drop_last=False, pad_mode="blank",
               num_workers=1, process_index=r, process_count=2)
        for r in range(2)
    ]
    for fb, *pbs in zip(full.epoch(0), *(p.epoch(0) for p in parts)):
        merged = np.concatenate([pb["label"] for pb in pbs], axis=0)
        np.testing.assert_array_equal(merged, fb["label"])
