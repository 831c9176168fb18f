"""Host input pipeline (rebuilds C6 dual loaders + the N4/N6 native-dep
surface: decode workers, prefetch, pinned feed).

The host does exactly three things per sample — decode, paste into a static
uint8 canvas, record (h, w) — and ships the batch; every transform runs on
device (BASELINE.json:5).  Static canvas shapes mean the jitted step compiles
once per config.

Prefetch: a background thread assembles batches through a thread pool (PIL
decode drops the GIL) into a bounded queue, overlapping input with device
compute — the grain-style pipeline without requiring real data for tests.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from semi_supervised_semantic_segmentation_tpu.data.datasets import SegDataset

Batch = Dict[str, np.ndarray]


def _assemble(dataset: SegDataset, indices, canvas_hw: Tuple[int, int], pool) -> Batch:
    hc, wc = canvas_hw
    b = len(indices)
    images = np.zeros((b, hc, wc, 3), dtype=np.uint8)
    labels = np.full((b, hc, wc), 255, dtype=np.int32)
    sizes = np.zeros((b, 2), dtype=np.int32)

    def fill(slot_index):
        slot, index = slot_index
        if index < 0:  # blank pad slot (eval): all-ignore labels, zero image
            sizes[slot] = (1, 1)
            return
        h, w = dataset.get_into(int(index), images[slot], labels[slot])
        sizes[slot] = (h, w)

    list(pool.map(fill, enumerate(indices)))
    return {
        "image": images,
        "label": labels,
        "size": sizes,
        "index": np.asarray(indices, dtype=np.int32),
    }


class Loader:
    """Epoch-based batch loader with deterministic per-epoch shuffling."""

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        canvas_hw: Optional[Tuple[int, int]] = None,
        pad_mode: str = "wrap",  # 'wrap' (train) | 'blank' (eval: exact count)
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.pad_mode = pad_mode
        # Multi-host: every process computes the SAME deterministic global
        # order (seeded shuffle) and assembles only its contiguous row-block
        # of each global batch; mesh_lib.shard_batch stitches the blocks into
        # one global jax.Array (device order follows process order).
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch_size = batch_size // process_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.canvas_hw = canvas_hw or dataset.canvas_hw
        self.prefetch = prefetch
        self._pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return max(n // self.batch_size, 1)
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed * 1_000_003 + epoch).shuffle(order)
        # Pad up to a full batch (keeps shapes static): 'wrap' repeats samples
        # (train), 'blank' inserts all-ignore slots so eval counts are exact.
        total = len(self) * self.batch_size
        if total > n:
            if self.pad_mode == "wrap":
                order = np.resize(order, total)  # cyclic repeat
            else:
                pad = np.full(total - n, -1, dtype=order.dtype)
                order = np.concatenate([order, pad])
        return order[:total]

    def epoch(self, epoch: int) -> Iterator[Batch]:
        """Iterate one epoch with background prefetch."""
        order = self._epoch_indices(epoch)
        batches = order.reshape(-1, self.batch_size)
        if self.process_count > 1:
            lo = self.process_index * self.local_batch_size
            batches = batches[:, lo : lo + self.local_batch_size]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                for idxs in batches:
                    q.put(_assemble(self.dataset, idxs, self.canvas_hw, self._pool))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def cycle(self, start_epoch: int = 0) -> Iterator[Batch]:
        """Endless stream (labeled loader cycling in the zip pattern)."""
        epoch = start_epoch
        while True:
            yield from self.epoch(epoch)
            epoch += 1


class DualLoader:
    """zip(cycle(labeled), unlabeled): the unlabeled pass defines the epoch,
    the labeled loader recycles (C6 / SURVEY §2.1)."""

    def __init__(self, labeled: Loader, unlabeled: Loader):
        self.labeled = labeled
        self.unlabeled = unlabeled
        self._labeled_iter: Optional[Iterator[Batch]] = None

    def __len__(self) -> int:
        return len(self.unlabeled)

    def epoch(self, epoch: int) -> Iterator[Tuple[Batch, Batch]]:
        if self._labeled_iter is None:
            self._labeled_iter = self.labeled.cycle(start_epoch=epoch)
        for unlab in self.unlabeled.epoch(epoch):
            yield next(self._labeled_iter), unlab
