"""Decompose the DataLoader's 1,264 -> 880 items/s gap (VERDICT r4 task 5).

Round 4 measured `batch_items` direct at 1,264 items/s and the threaded
DataLoader at 880 items/s on this 1-core box, and ATTRIBUTED the gap to
"executor scheduling on a single core — vanishes when workers have their
own cores" without measuring it. This script replaces the assertion with
four measured rows over the same on-disk JPEG dataset bench.py --real_io
uses (reference host path: multimodal_data_module.py:362-403):

  direct          batch_items(idxs) called in a bare loop (no loader)
  sync loader     DataLoader with MMB_LOADER_SYNC=1 — same index
                  generation + iteration machinery, executor bypassed.
                  direct - sync = the loader's own logic cost.
  threaded w=N    the committed configs. sync - threaded = the
                  ThreadPoolExecutor hop (submit/result/future wake-ups
                  contending with the C++ decode pool for one core).
  overlap         the claim under test: with a consumer that holds the
                  batch for T_step of GIL-free time (time.sleep — same
                  GIL behavior as a device step's async dispatch +
                  blocking fetch), the threaded loader should hide
                  decode behind the consumer even on one core, while the
                  sync loader strictly serializes. items/s measured for
                  both at T_step = 0.5x and 1.0x the per-batch decode
                  time.

Run on a QUIET box (the numbers are scheduling-sensitive):
    PYTHONPATH=. python scripts/perf_loader_gap.py
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # no TPU needed

from bench import BATCH, ensure_jpeg_dataset
from multimodal_baby_tpu.data.datasets import (PairedImageTextDataset,
                                               load_metadata)
from multimodal_baby_tpu.data.loader import DataLoader
from multimodal_baby_tpu.data.vocab import Vocab

N_BATCHES = int(os.environ.get("MMB_LOADER_GAP_BATCHES", "24"))


def build_dataset():
    meta_path = ensure_jpeg_dataset()
    data = load_metadata(meta_path)
    vocab = Vocab.build([d["utterance"] for d in data], min_freq=1)
    return PairedImageTextDataset(data, vocab)


def timed(fn, n_batches=N_BATCHES):
    t0 = time.perf_counter()
    count = fn(n_batches)
    dt = time.perf_counter() - t0
    return count * BATCH / dt


def run_direct(dataset):
    rng = np.random.RandomState(0)
    order = rng.permutation(len(dataset))

    def go(n):
        for b in range(n):
            idxs = order[(b * BATCH) % (len(order) - BATCH):][:BATCH]
            dataset.batch_items(idxs)
        return n

    go(2)  # warm (page cache, native pipeline init)
    return timed(go)


def run_loader(dataset, sync, workers, prefetch, hold_s=0.0):
    loader = DataLoader(dataset, batch_size=BATCH, shuffle=True,
                        drop_last=True, num_workers=workers,
                        prefetch=prefetch)
    if sync:
        os.environ["MMB_LOADER_SYNC"] = "1"
    try:
        def go(n):
            count = 0
            it = iter(loader)
            while count < n:
                try:
                    next(it)
                except StopIteration:
                    it = iter(loader)
                    continue
                if hold_s:
                    time.sleep(hold_s)  # GIL-free consumer (device step)
                count += 1
            return count

        go(2)
        return timed(go)
    finally:
        os.environ.pop("MMB_LOADER_SYNC", None)


def main():
    dataset = build_dataset()
    rows = {}
    rows["direct_batch_items"] = round(run_direct(dataset), 1)
    rows["sync_loader"] = round(run_loader(dataset, True, 1, 0), 1)
    rows["threaded_w1_p1"] = round(run_loader(dataset, False, 1, 1), 1)
    rows["threaded_w4_p6"] = round(run_loader(dataset, False, 4, 6), 1)

    # overlap: consumer holds each batch for T_step of GIL-free time.
    # Per-batch decode time from the direct row:
    t_batch = BATCH / rows["direct_batch_items"]
    for frac in (0.5, 1.0):
        hold = t_batch * frac
        s = run_loader(dataset, True, 1, 0, hold_s=hold)
        t = run_loader(dataset, False, 4, 6, hold_s=hold)
        rows[f"overlap_hold{frac}x_sync"] = round(s, 1)
        rows[f"overlap_hold{frac}x_threaded"] = round(t, 1)

    rows["unit"] = "items/s"
    rows["batch"] = BATCH
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
