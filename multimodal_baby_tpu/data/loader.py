"""Host-side batching + prefetch feeding fixed-shape device batches.

Replaces torch DataLoader workers (reference: multimodal_data_module.py:
362-403). Threads decode/collate on host while the device computes; images
ship as uint8 (4x less host->device traffic than the reference's f32
pipeline) and augmentation/normalization happen on-device inside the train
jit (see data.augment). When the native C++ decode pipeline (data.native) is
built, item loading transparently uses it.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def collate(items) -> Dict[str, np.ndarray]:
    """items: (img_uint8 [H,W,3], ids [L], length, raw) tuples ->
    fixed-shape arrays (reference collate: multimodal_data_module.py:98-109,
    with static padding instead of dynamic)."""
    imgs, ids, lens, raws = zip(*items)
    return {
        "image_u8": np.stack(imgs),
        "text": np.stack(ids),
        "text_len": np.asarray(lens, np.int32),
        "raw": list(raws),
    }


class DataLoader:
    """Iterates shuffled fixed-size batches with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield idxs

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import os
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        batch_items = getattr(self.dataset, "batch_items", None)

        def make(idxs):
            # batched fast path: one native decode_batch call per batch
            # (the ctypes call releases the GIL; the C++ thread pool does
            # the decode) instead of GIL-bound per-item __getitem__
            if batch_items is not None:
                return batch_items(idxs)
            return collate([self.dataset[int(j)] for j in idxs])

        if os.environ.get("MMB_LOADER_SYNC", "0") == "1":
            # measurement/debug bypass: produce batches inline on the
            # consumer thread — no executor, no prefetch. Isolates the
            # ThreadPoolExecutor hop's cost from the loader's own logic
            # (scripts/perf_loader_gap.py decomposes the two).
            for idxs in self._batch_indices():
                yield make(idxs)
            return

        it = self._batch_indices()
        ex = ThreadPoolExecutor(self.num_workers)
        try:
            in_flight: deque = deque()
            for idxs in it:
                in_flight.append(ex.submit(make, idxs))
                if len(in_flight) >= self.prefetch + self.num_workers:
                    break
            while in_flight:
                batch = in_flight.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    in_flight.append(ex.submit(make, nxt))
                yield batch
        finally:
            # don't block on prefetched work when the consumer abandons
            # the iterator mid-epoch; swallow teardown-time errors (at
            # interpreter exit the queue module may already be torn down
            # when an abandoned generator is finalized)
            try:
                ex.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass
