"""Host-decode microbenchmark: per-image cost of the native C++ batch
decoder at the bench operating point (256px JPEG -> 224), exact vs
DCT-scaled (fast) decode, across thread counts.

Replaces the round-3 "~6.2k items/s at 8 cores" extrapolation with a
measured threads-vs-throughput curve (on a 1-core box the >1-thread rows
quantify scheduling overlap, not parallel speedup — read them with the
core count printed in the header). CPU-only; safe to run without the TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from multimodal_baby_tpu.data import native  # noqa: E402


def main():
    from bench import ensure_jpeg_dataset, JPEG_DIR
    ensure_jpeg_dataset()
    frames = sorted(
        os.path.join(JPEG_DIR, "frames", f)
        for f in os.listdir(os.path.join(JPEG_DIR, "frames")))[:1024]
    assert native.available(), "native pipeline failed to build"
    print(f"cores={os.cpu_count()} images={len(frames)} (256px jpeg -> 224)")

    rows = []
    for fast in (False, True):
        for threads in (1, 2, 4, 8):
            # warm page cache / thread pool
            native.decode_batch(frames[:64], 224, n_threads=threads,
                                fast=fast)
            t0 = time.perf_counter()
            out = native.decode_batch(frames, 224, n_threads=threads,
                                      fast=fast)
            dt = time.perf_counter() - t0
            assert out is not None and out.shape[0] == len(frames)
            ms = dt / len(frames) * 1e3
            rows.append({"fast": fast, "threads": threads,
                         "ms_per_image": round(ms, 3),
                         "images_per_s": round(len(frames) / dt, 1)})
            print(json.dumps(rows[-1]))

    # equivalence spot-check on this dataset (low-frequency frames)
    a = native.decode_batch(frames[:32], 224, fast=False)
    b = native.decode_batch(frames[:32], 224, fast=True)
    print(json.dumps({"fast_vs_exact_mean_abs_u8":
                      round(float(np.abs(a.astype(int)
                                         - b.astype(int)).mean()), 3)}))


if __name__ == "__main__":
    main()
