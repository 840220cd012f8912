"""Host feed matrix: batches/s of the REAL augmentation pipeline per worker
count (VERDICT r4 item 7).

The reference trains with 8 DataLoader workers
(`/root/reference/src/Segmentation/train.py:63-70`); our `batch_iterator`
has a ThreadPoolExecutor path (`seg/data.py::batch_iterator(num_workers=)`)
that had no recorded measurement. This sweeps num_workers x prefetch over
the full train_transform (ColorJitter + flip-with-class-swap + RandomScale
+ RandomCrop at 448px) on synthetic in-memory 512px sources — the same
per-item work as CelebAMask-HQ minus disk JPEG decode — and prints one JSON
line per configuration.

Host-only: run with PALLAS_AXON_POOL_IPS= (no TPU needed, and it must not
disturb a live chip job).
"""

from __future__ import annotations

import json
import time

import numpy as np
from PIL import Image

from diffusion_image_editing_tpu.seg.data import (
    batch_iterator,
    train_transform,
)

BATCH = 16
N_SRC = 32  # distinct synthetic source images (cache-resident, like page cache)


class SyntheticAugmented:
    """In-memory 512px sources through the REAL train_transform — the
    FaceMaskDataset work profile without the (env-blocked) download."""

    def __init__(self, n=N_SRC, raw=True, crop=(448, 448)):
        rng = np.random.default_rng(0)
        self.ims = [
            Image.fromarray(rng.integers(0, 255, (512, 512, 3), dtype=np.uint8))
            for _ in range(n)
        ]
        self.lbs = [
            Image.fromarray(
                rng.integers(0, 19, (512, 512), dtype=np.uint8), mode="P"
            )
            for _ in range(n)
        ]
        self.raw = raw
        self.crop = crop

    def __len__(self):
        return len(self.ims)

    def __getitem__(self, idx, rng=None):
        rng = rng or np.random.default_rng(idx)
        im, lb = train_transform(self.ims[idx], self.lbs[idx], rng, self.crop)
        if self.raw:
            return (np.asarray(im.convert("RGB"), np.uint8),
                    np.array(lb).astype(np.uint8))
        from diffusion_image_editing_tpu.seg.data import to_model_input

        return to_model_input(im), np.array(lb).astype(np.int32)


def measure(num_workers: int, prefetch: int, raw: bool, n_batches: int = 12):
    ds = SyntheticAugmented(raw=raw)
    it = batch_iterator(ds, BATCH, seed=0, process_index=0, process_count=1,
                        prefetch=prefetch, num_workers=num_workers)
    # warm (thread pool spin-up, first permutation)
    for _ in range(3):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = (time.perf_counter() - t0) / n_batches
    if hasattr(it, "close"):
        it.close()
    return dt


def main():
    for raw in (True, False):
        for workers in (0, 1, 2, 4, 8):
            for prefetch in (0, 2):
                dt = measure(workers, prefetch, raw)
                print(json.dumps({
                    "feed": "uint8" if raw else "f32-normalized",
                    "num_workers": workers,
                    "prefetch": prefetch,
                    "ms_per_batch16": round(dt * 1e3, 1),
                    "img_s": round(BATCH / dt, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
